from strutopy_tpu.eval.heldout import eval_heldout, eval_heldout_jax, cut_in_half, split_corpus
from strutopy_tpu.eval.residuals import check_residuals
from strutopy_tpu.eval.diagnostics import (
    ecdf,
    frex,
    label_topics,
    find_thoughts,
    exclusivity,
    semantic_coherence,
    topic_quality,
    plot_topic_quality,
)
from strutopy_tpu.eval.perplexity import perplexity
from strutopy_tpu.eval.graph import topic_correlations, topic_graph
from strutopy_tpu.eval.effects import (
    estimate_effect,
    estimate_effect_composition,
    estimate_content_effect,
    simulate_theta,
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
    "topic_quality",
    "plot_topic_quality",
    "perplexity",
    "topic_correlations",
    "topic_graph",
    "estimate_effect",
    "estimate_effect_composition",
    "estimate_content_effect",
    "simulate_theta",
]
