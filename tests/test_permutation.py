"""Treatment permutation test (eval/effects.py::permutation_test).

R-stm's permutationTest; absent from the python reference.  On a
corpus with a planted, unmistakable treatment effect (treated docs
draw from a disjoint vocabulary block), the true assignment's maximal
effect must dominate every permuted run's.
"""

import numpy as np
import pytest

from strutopy_tpu.eval.effects import permutation_test, plot_permutation_test


@pytest.fixture(scope="module")
def planted():
    rng = np.random.default_rng(3)
    V, m, half = 100, 60, 24
    docs, treatment = [], []
    for i in range(2 * half):
        treated = i >= half
        p = np.full(V, 1e-3)
        block = slice(50, 100) if treated else slice(0, 50)
        p[block] += 1.0
        p /= p.sum()
        x = rng.multinomial(m, p)
        ids = np.nonzero(x)[0]
        docs.append([(int(w), int(x[w])) for w in ids])
        treatment.append(float(treated))
    return docs, np.asarray(treatment)


def test_true_assignment_dominates_permutations(planted):
    docs, treatment = planted
    res = permutation_test(
        docs, treatment, K=2, nruns=4, seed=0,
        init_type="spectral", max_em_iter=8, batch_size=16,
    )
    assert res["pvalue"] == pytest.approx(1 / 5)
    assert abs(res["ref"]["coef"]) > 0.5  # near-total separation
    for r in res["permuted"]:
        assert abs(r["coef"]) < abs(res["ref"]["coef"])
    # the plot renders without error
    fig = plot_permutation_test(res)
    assert fig is not None


def test_treatment_length_validated(planted):
    docs, treatment = planted
    with pytest.raises(ValueError, match="entries"):
        permutation_test(docs, treatment[:-1], K=2, nruns=1)
