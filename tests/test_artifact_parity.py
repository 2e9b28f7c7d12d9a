"""Eval parity anchored on the reference's COMMITTED model artifacts.

Loads /root/reference/src/artifacts/reference_model/{50,70}
(theta/eta/mu/sigma/gamma/X from the reference's actual 25-iteration
wiki fits — note the reference commits no beta_hat, so beta is derived
deterministically from the committed theta and the committed wiki
corpus via the LDA M-step) and asserts our heldout / FREX /
label_topics / find_thoughts reproduce the reference functions'
outputs on those inputs (SURVEY §4 / VERDICT r1 missing #4).

Reference: src/modules/stm.py:1151-1259 (label_topics/frex/
find_thoughts/ecdf), src/modules/heldout.py:70-97 (cut_in_half/
eval_heldout), save_model artifact contract stm.py:1120-1149.
"""

import os
import pickle

import numpy as np
import pytest

REF = "/root/reference/src/artifacts/reference_model"
WIKI = "/root/reference/src/artifacts/wiki_data"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REF) and os.path.isdir(WIKI)),
    reason="reference artifacts not mounted",
)


@pytest.fixture(scope="module", params=["50", "70"])
def artifact(request):
    d = os.path.join(REF, request.param)
    out = {
        name: np.load(os.path.join(d, f"{name}_hat.npy"))
        for name in ("theta", "eta", "mu", "sigma", "gamma")
    }
    out["X"] = np.load(os.path.join(d, "X.npy"), allow_pickle=True)
    with open(os.path.join(d, "lower_bound.pickle"), "rb") as f:
        out["lower_bound"] = pickle.load(f)
    out["K"] = out["theta"].shape[1]
    return out


@pytest.fixture(scope="module")
def wiki_docs():
    from strutopy_tpu.corpus.io import read_mm

    return read_mm(os.path.join(WIKI, "BoW_corpus.mm"))


@pytest.fixture(scope="module")
def derived_beta_factory(wiki_docs):
    """Deterministic beta from committed theta + committed corpus: the
    LDA M-step beta_kv ∝ sum_d theta_dk * count_dv (the reference
    commits no beta_hat; this is the natural fit-consistent surrogate,
    computed in float64)."""
    V = 1 + max(w for doc in wiki_docs for (w, _) in doc)

    def make(theta):
        K = theta.shape[1]
        beta_ss = np.zeros((K, V))
        for i, doc in enumerate(wiki_docs):
            ids = np.array([w for w, _ in doc])
            cts = np.array([c for _, c in doc], np.float64)
            beta_ss[:, ids] += theta[i][:, None] * cts[None, :]
        return beta_ss / beta_ss.sum(axis=1, keepdims=True)

    return make


def _ref_carcass(ref_stm, K, N, beta=None, theta=None, dictionary=None):
    inst = object.__new__(ref_stm.STM)
    inst.K = K
    inst.N = N
    inst.beta = beta
    inst.theta = theta
    inst.dictionary = dictionary
    inst.wcounts = None
    return inst


def test_artifact_internal_consistency(artifact):
    """The committed artifacts obey the reference's own model relations:
    theta = softmax([eta, 0]) (stm.py:1094-1101) and mu = X @ gamma.T
    (update_mu, stm.py:697-706, intercept discarded)."""
    eta = artifact["eta"]
    ef = np.c_[eta, np.zeros(len(eta))]
    th = np.exp(ef - ef.max(axis=1, keepdims=True))
    th /= th.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(artifact["theta"], th, atol=1e-12)
    np.testing.assert_allclose(
        artifact["mu"], artifact["X"] @ artifact["gamma"].T, atol=1e-12
    )
    assert len(artifact["lower_bound"]) == 25  # max_em_iter in stm_config


def test_heldout_parity_on_artifacts(ref_modules, artifact, wiki_docs,
                                     derived_beta_factory):
    """Document-completion heldout through our stack vs the reference's
    eval_heldout on the committed theta + derived beta: <=1e-5."""
    _, ref_heldout = ref_modules
    from strutopy_tpu.eval.heldout import cut_in_half, eval_heldout

    beta = derived_beta_factory(artifact["theta"])
    first, second = cut_in_half(wiki_docs)
    ours = eval_heldout(second, artifact["theta"], beta)
    theirs = ref_heldout.eval_heldout(
        [np.asarray(d) for d in second], artifact["theta"], beta
    )
    assert abs(ours - theirs) <= 1e-5 * abs(theirs)
    assert np.isfinite(ours)


def test_frex_and_labels_parity_on_artifacts(ref_modules, artifact,
                                             derived_beta_factory):
    """FREX scores and topic labels from the derived wiki beta must match
    the reference's frex/label_topics exactly."""
    ref_stm, _ = ref_modules
    from strutopy_tpu.eval.diagnostics import frex, label_topics

    beta = derived_beta_factory(artifact["theta"])
    K, V = beta.shape
    vocab = [str(i) for i in range(V)]
    carcass = _ref_carcass(ref_stm, K, len(artifact["theta"]), beta=beta,
                           dictionary=vocab)

    ours_frex = frex(beta, w=0.5)
    theirs_frex = carcass.frex(w=0.5)
    np.testing.assert_allclose(ours_frex, theirs_frex, rtol=1e-10, atol=1e-12)

    topics = list(range(min(5, K)))
    ours_prob, ours_frexw = label_topics(beta, vocab, topics=topics, n=4)
    theirs_prob, theirs_frexw = carcass.label_topics(topics=topics, n=4)
    assert [list(r) for r in ours_prob] == [list(r) for r in theirs_prob]
    assert [list(r) for r in ours_frexw] == [list(r) for r in theirs_frexw]


def test_find_thoughts_parity_on_artifacts(ref_modules, artifact):
    """Representative-document ranking on the committed theta."""
    ref_stm, _ = ref_modules
    from strutopy_tpu.eval.diagnostics import find_thoughts

    theta = artifact["theta"]
    carcass = _ref_carcass(ref_stm, artifact["K"], len(theta), theta=theta)
    topics = [0, 3, artifact["K"] - 1]
    ours = find_thoughts(theta, topics=topics, n=5)
    theirs = carcass.find_thoughts(topics=topics, n=5)
    for a, b in zip(ours, theirs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
