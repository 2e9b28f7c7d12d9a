from strutopy_tpu.eval.heldout import eval_heldout, eval_heldout_jax, cut_in_half, split_corpus
from strutopy_tpu.eval.diagnostics import (
    ecdf,
    frex,
    label_topics,
    find_thoughts,
    exclusivity,
    semantic_coherence,
)

__all__ = [
    "eval_heldout",
    "eval_heldout_jax",
    "cut_in_half",
    "split_corpus",
    "ecdf",
    "frex",
    "label_topics",
    "find_thoughts",
    "exclusivity",
    "semantic_coherence",
]
