from multimodal_uncertainty_tpu.parallel.mesh import make_mesh  # noqa: F401
from multimodal_uncertainty_tpu.parallel.pipeline import (  # noqa: F401
    pipeline_apply,
    pipeline_sharded,
)
from multimodal_uncertainty_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    replicated,
    shard_state,
    transformer_tp_rules,
)
