"""Golden-output regression tests.

Freeze tiny-preset forward outputs at fixed seeds so refactors that change
numerics (layer semantics, dtype handling, fusion changes) are caught across
sessions — the stand-in for SURVEY §4's golden-value parity strategy until
the released reference weights are obtainable for layer-by-layer comparison.

Regenerate (after an INTENTIONAL numeric change) with:
    python tests/test_goldens.py regen
"""
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN = Path(__file__).parent / "goldens" / "tiny_forward.npz"
ATOL = 2e-4  # CPU/TPU and fusion-order tolerance


def _compute():
    from hdenseunet_tpu.core.module import Ctx
    from hdenseunet_tpu.models import denseunet2d, denseunet3d, hybrid

    out = {}
    rng = np.random.default_rng(1234)

    p2, s2 = denseunet2d.init(jax.random.key(7), input_size=32, **denseunet2d.PRESETS["tiny"])
    x2 = jnp.asarray(rng.normal(0, 50, (2, 32, 32, 3)).astype(np.float32))
    ctx = Ctx(p2, s2, train=False)
    feat, logits = denseunet2d.apply(ctx, x2, **denseunet2d.PRESETS["tiny"])
    out["d2_logits"] = np.asarray(logits)
    out["d2_feat_sum"] = np.asarray(jnp.sum(feat, axis=(1, 2)))

    p3, s3 = denseunet3d.init(jax.random.key(8), input_size=32, input_cols=8,
                              channels=4, **denseunet3d.PRESETS["tiny"])
    x3 = jnp.asarray(rng.normal(0, 50, (1, 32, 32, 8, 4)).astype(np.float32))
    ctx = Ctx(p3, s3, train=False)
    feat3, logits3 = denseunet3d.apply(ctx, x3, **denseunet3d.PRESETS["tiny"])
    out["d3_logits"] = np.asarray(logits3)

    ph, sh = hybrid.init(jax.random.key(9), input_size=32, input_cols=8, batch=1, preset="tiny")
    xv = jnp.asarray(rng.normal(0, 50, (1, 32, 32, 8, 1)).astype(np.float32))
    ctx = Ctx(ph, sh, train=False)
    out["hybrid_logits"] = np.asarray(hybrid.apply(ctx, xv, arch="end2end", preset="tiny"))
    return out


def test_tiny_forward_matches_goldens():
    if not GOLDEN.exists():
        pytest.skip("goldens not generated yet (python tests/test_goldens.py regen)")
    got = _compute()
    with np.load(GOLDEN) as z:
        for key in z.files:
            np.testing.assert_allclose(
                got[key], z[key], atol=ATOL, rtol=1e-4,
                err_msg=f"golden drift in {key} — if intentional, regenerate",
            )


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        import os

        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        jax.config.update("jax_platforms", "cpu")
        GOLDEN.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(GOLDEN, **_compute())
        print(f"wrote {GOLDEN}")
