"""LDAvis export (R-stm toLDAvis analog, eval/ldavis.py)."""

import json

import numpy as np
import pytest

from strutopy_tpu.eval.ldavis import (
    _classical_mds,
    _jensen_shannon,
    model_to_ldavis,
    to_ldavis,
)


def _toy_payload(K=4, V=40, N=60, R=8, seed=0):
    rng = np.random.default_rng(seed)
    beta = rng.dirichlet(np.full(V, 0.1), size=K)
    theta = rng.dirichlet(np.full(K, 0.5), size=N)
    lengths = rng.integers(20, 80, N)
    vocab = [f"w{v}" for v in range(V)]
    return to_ldavis(beta, theta, lengths, vocab, R=R, lambda_step=0.25), (
        beta, theta, lengths, vocab,
    )


def _regen(seed=0, K=4, V=40, N=60):
    rng = np.random.default_rng(seed)
    beta = rng.dirichlet(np.full(V, 0.1), size=K)
    theta = rng.dirichlet(np.full(K, 0.5), size=N)
    lengths = rng.integers(20, 80, N)
    vocab = [f"w{v}" for v in range(V)]
    return beta, theta, lengths, vocab


def test_payload_schema_and_json_serializable(tmp_path):
    payload, _ = _toy_payload()
    assert set(payload) == {
        "mdsDat", "tinfo", "token.table", "R", "lambda.step",
        "plot.opts", "topic.order",
    }
    s = json.dumps(payload)  # the whole point: servable JSON
    assert len(s) > 100
    # writing via path= produces the identical document
    p = tmp_path / "ldavis.json"
    to_ldavis(*_regen(), R=8, lambda_step=0.25, path=str(p))
    assert json.loads(p.read_text()) == json.loads(s)


def test_topic_order_and_shares():
    payload, (beta, theta, lengths, _) = _toy_payload()
    freq = np.asarray(lengths, float) @ theta
    prop = freq / freq.sum()
    order = np.argsort(-prop, kind="stable")
    assert payload["topic.order"] == [int(o + 1) for o in order]
    # mdsDat.Freq is the ordered share in percent, summing to 100
    np.testing.assert_allclose(payload["mdsDat"]["Freq"],
                               100.0 * prop[order], atol=1e-9)
    np.testing.assert_allclose(sum(payload["mdsDat"]["Freq"]), 100.0)
    assert payload["mdsDat"]["topics"] == [1, 2, 3, 4]
    assert len(payload["mdsDat"]["x"]) == 4


def test_tinfo_relevance_and_token_table():
    payload, (beta, theta, lengths, vocab) = _toy_payload(R=8)
    tinfo = payload["tinfo"]
    cats = set(tinfo["Category"])
    assert "Default" in cats and "Topic1" in cats and "Topic4" in cats
    n_default = sum(1 for c in tinfo["Category"] if c == "Default")
    assert n_default == 8
    # every topic row's Freq (term-topic tokens) <= Total (term tokens);
    # Default rows carry the term's corpus frequency in Freq/Total
    # (the overview bar widths — NOT the rank scale, which lives in
    # logprob/loglift as R..1), so Freq == Total there
    default_ranks = []
    for c, f, t, lp in zip(tinfo["Category"], tinfo["Freq"],
                           tinfo["Total"], tinfo["logprob"]):
        if c != "Default":
            assert f <= t + 1e-9
        else:
            assert f == t and f > 0
            default_ranks.append(lp)
    assert default_ranks == sorted(default_ranks, reverse=True)
    assert default_ranks[0] == 8.0 and default_ranks[-1] == 1.0
    # token.table shares of one term sum to ~1 over topics
    tt = payload["token.table"]
    by_term = {}
    for topic, f, term in zip(tt["Topic"], tt["Freq"], tt["Term"]):
        by_term.setdefault(term, 0.0)
        by_term[term] += f
    for term, s in by_term.items():
        assert abs(s - 1.0) < 1e-4, (term, s)
    # lambda=1 relevance ranking is the in-topic probability ranking:
    # the highest-phi word of (re-ordered) topic 1 must appear among
    # its candidate terms
    phi = beta / beta.sum(axis=1, keepdims=True)
    freq = np.asarray(lengths, float) @ theta
    k0 = int(np.argsort(-(freq / freq.sum()))[0])
    top_word = vocab[int(np.argmax(phi[k0]))]
    topic1_terms = {
        t for t, c in zip(tinfo["Term"], tinfo["Category"]) if c == "Topic1"
    }
    assert top_word in topic1_terms


def test_mds_is_classical_torgerson():
    # exact for points already in 2-D: recovered distances match
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 2.0], [3.0, 1.0]])
    D = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    Y = _classical_mds(D)
    D2 = np.linalg.norm(Y[:, None] - Y[None, :], axis=-1)
    np.testing.assert_allclose(D2, D, atol=1e-8)
    # JS divergence: symmetric, zero diagonal, bounded by log 2
    P = np.random.default_rng(1).dirichlet(np.ones(10), size=3)
    J = _jensen_shannon(P)
    np.testing.assert_allclose(J, J.T, atol=1e-12)
    assert np.all(np.diag(J) == 0) and np.all(J <= np.log(2) + 1e-12)


def test_input_validation():
    beta, theta, lengths, vocab = _regen()
    with pytest.raises(ValueError, match="marginalize"):
        to_ldavis(np.stack([beta, beta]), theta, lengths, vocab)
    with pytest.raises(ValueError, match="shape mismatch"):
        to_ldavis(beta, theta[:, :3], lengths, vocab)
    with pytest.raises(ValueError, match="lambda_step"):
        to_ldavis(beta, theta, lengths, vocab, lambda_step=0.0)
    # R larger than V is capped
    payload = to_ldavis(beta, theta, lengths, vocab, R=1000, lambda_step=0.5)
    assert payload["R"] == len(vocab)


def test_model_to_ldavis_on_fitted_stm(toy_corpus, toy_dictionary, tmp_path):
    from strutopy_tpu.models.stm import STM

    model = STM(
        toy_corpus.documents, dictionary=toy_dictionary, K=3,
        init_type="random", max_em_iter=2, seed=1,
    )
    model.expectation_maximization(saving=False)
    p = tmp_path / "m.json"
    payload = model_to_ldavis(model, R=10, path=str(p))
    assert p.exists() and payload["mdsDat"]["topics"] == [1, 2, 3]
    terms = set(payload["tinfo"]["Term"])
    assert terms <= set(str(w) for w in toy_dictionary)
    # the STM method is the same payload
    payload2 = model.to_ldavis(R=10)
    assert payload2["topic.order"] == payload["topic.order"]
    assert payload2["tinfo"] == payload["tinfo"]
