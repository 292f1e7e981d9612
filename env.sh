# Environment configuration (reference env.sh parity).
export PYTHONPATH="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd):$PYTHONPATH"
export DATA_DIR="${DATA_DIR:-$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)/data_dir}"
export RESULTS_DIR="${RESULTS_DIR:-$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)/results}"
# persistent XLA compile cache: restarts/preemption resumes skip the
# recompile (train.py --compile_cache defaults from this; set empty to opt out)
export MMU_COMPILE_CACHE="${MMU_COMPILE_CACHE-/tmp/mmu_compile_cache}"
