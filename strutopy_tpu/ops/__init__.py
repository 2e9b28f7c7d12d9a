from strutopy_tpu.ops.linalg import make_pd, chol_pd, cho_inverse, precompute_sigma
from strutopy_tpu.ops.estep import EStepResult, run_estep

__all__ = [
    "make_pd",
    "chol_pd",
    "cho_inverse",
    "precompute_sigma",
    "EStepResult",
    "run_estep",
]
