"""pair_hist builder equivalence: the size-adaptive one-hot matmul and the
composite-index scatter-add must agree exactly (the scatter path serves
large 3D cubes where the suite's small fixtures take the matmul path)."""

import numpy as np

import jax.numpy as jnp

from nyxus_tpu.ops.common import bincount2d, pair_hist, pair_hist_scatter


def test_pair_hist_paths_agree():
    r = np.random.default_rng(0)
    B, A, ni, nj = 3, 500, 17, 9
    i_idx = jnp.asarray(r.integers(-2, ni + 2, (B, A)), jnp.int32)
    j_idx = jnp.asarray(r.integers(-2, nj + 2, (B, A)), jnp.int32)
    w = jnp.asarray(r.random((B, A)))
    a = np.asarray(pair_hist_scatter(i_idx, j_idx, w, ni, nj))
    ok = np.asarray((i_idx >= 0) & (i_idx < ni) & (j_idx >= 0) & (j_idx < nj))
    b = np.asarray(bincount2d(jnp.clip(i_idx, 0, ni - 1),
                              jnp.clip(j_idx, 0, nj - 1),
                              jnp.where(jnp.asarray(ok), w, 0), ni, nj))
    np.testing.assert_allclose(a, b, rtol=1e-12)
    c = np.asarray(pair_hist(i_idx, j_idx, w, ni, nj))
    np.testing.assert_allclose(c, a, rtol=1e-12)

    # oracle
    ref = np.zeros((B, ni, nj))
    iid = np.asarray(i_idx)
    jid = np.asarray(j_idx)
    wn = np.asarray(w)
    for bb in range(B):
        for k in range(A):
            if ok[bb, k]:
                ref[bb, iid[bb, k], jid[bb, k]] += wn[bb, k]
    np.testing.assert_allclose(a, ref, rtol=1e-9)
