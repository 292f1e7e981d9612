"""Model registry and public model surface.

``model_configure`` maps model_type -> (emb_dim E_in, out_dim E_out),
mirroring the reference table at ``src/model.py:8-15``.
"""
from multimodal_uncertainty_tpu.models.fusion import (  # noqa: F401
    FlavaFusionTransfomer,
    FlavaFusionTransformer,
    flava_fusion_with_cls_token,
)
from multimodal_uncertainty_tpu.models.mimo_resnet import MIMOResNet  # noqa: F401
from multimodal_uncertainty_tpu.models.mimo_transformer import (  # noqa: F401
    MIMOTransfomer,
    MIMOTransformer,
)

model_configure = {
    "Vanilla": (4, 1),
    "MIMO-shuffle-instance": (4, 4),
    "MIMO-shuffle-view": (4, 4),
    "MultiHead": (4, 4),
    "MIMO-shuffle-all": (4, 4),
    "single-model-weight-sharing": (1, 1),
}
