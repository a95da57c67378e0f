"""The TPU-optimized feature-major hash encode must match the reference jnp
implementation (fields.ngp.hashgrid_encode) up to bf16 rounding of hash-level
table values, and be differentiable w.r.t. the table."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from nerfjax.fields.ngp import HashGridSpec, InstantNGP, hashgrid_encode
from nerfjax.ops.hash_encode import hash_encode_planar


def _setup(n=257, log2=15, seed=0):
    spec = HashGridSpec(log2_hashmap_size=log2)
    k = jax.random.PRNGKey(seed)
    planes = jax.random.normal(k, (2, spec.total_table_size), jnp.float32) * 0.1
    x01 = jax.random.uniform(jax.random.PRNGKey(seed + 1), (n, 3))
    return spec, planes, x01


@pytest.mark.slow
def test_matches_reference_oracle():
    spec, planes, x01 = _setup()
    ref = hashgrid_encode(spec, planes, x01)  # [N, 32] plane-major
    fast = hash_encode_planar(
        spec, planes, x01[:, 0], x01[:, 1], x01[:, 2], dtype=jnp.float32
    )  # [32, N]
    # hash levels go through bf16 pair packing -> ~3 decimal digits
    np.testing.assert_allclose(np.asarray(fast.T), np.asarray(ref), atol=2e-3, rtol=2e-2)


def test_matches_reference_at_boundaries():
    spec, planes, _ = _setup()
    # corners and edges of the domain exercise the clamp path
    pts = jnp.array(
        [
            [0.0, 0.0, 0.0],
            [1.0, 1.0, 1.0],
            [0.0, 1.0, 0.5],
            [0.999999, 0.5, 0.0],
            [0.5, 0.5, 0.5],
        ],
        jnp.float32,
    )
    ref = hashgrid_encode(spec, planes, pts)
    fast = hash_encode_planar(spec, planes, pts[:, 0], pts[:, 1], pts[:, 2], dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(fast.T), np.asarray(ref), atol=2e-3, rtol=2e-2)


@pytest.mark.slow
def test_gradient_matches_reference():
    spec, planes, x01 = _setup(n=64)
    g_target = jax.random.normal(jax.random.PRNGKey(5), (64, 32))

    def loss_ref(p):
        return jnp.sum(hashgrid_encode(spec, p, x01) * g_target)

    def loss_fast(p):
        enc = hash_encode_planar(spec, p, x01[:, 0], x01[:, 1], x01[:, 2], dtype=jnp.float32)
        return jnp.sum(enc.T * g_target)

    gr = jax.grad(loss_ref)(planes)
    gf = jax.grad(loss_fast)(planes)
    # dense-level grads exact; hash-level grads through bf16 values of w*g
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=5e-3, rtol=5e-2)
    assert float(jnp.sum(jnp.abs(gf))) > 0


def test_planar_apply_matches_pointmajor():
    model = InstantNGP("small")
    params = model.init(jax.random.PRNGKey(0))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (130, 3), minval=-1, maxval=1)
    view = pos / jnp.linalg.norm(pos, axis=-1, keepdims=True)
    rgb_pm, sigma_pm = model.apply(params, pos, view)
    rgb_fm, sigma_fm = model.apply_planar(
        params,
        (pos[:, 0], pos[:, 1], pos[:, 2]),
        (view[:, 0], view[:, 1], view[:, 2]),
        dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(rgb_fm.T), np.asarray(rgb_pm), atol=3e-3)
    np.testing.assert_allclose(
        np.asarray(sigma_fm), np.asarray(sigma_pm[:, 0]), atol=3e-3
    )


def test_planar_vanilla_matches_pointmajor():
    from nerfjax.fields.vanilla import VanillaNeRF

    model = VanillaNeRF(pos_L=4, dir_L=2, hidden_dim=32)
    params = model.init(jax.random.PRNGKey(0))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (70, 3), minval=-1, maxval=1)
    view = pos / jnp.linalg.norm(pos, axis=-1, keepdims=True)
    rgb_pm, sigma_pm = model.apply(params, pos, view)
    rgb_fm, sigma_fm = model.apply_planar(
        params,
        (pos[:, 0], pos[:, 1], pos[:, 2]),
        (view[:, 0], view[:, 1], view[:, 2]),
    )
    np.testing.assert_allclose(np.asarray(rgb_fm.T), np.asarray(rgb_pm), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sigma_fm), np.asarray(sigma_pm[:, 0]), atol=1e-5
    )


@pytest.mark.slow
def test_render_rays_planar_matches_render_rays_stats():
    """Planar and point-major renders share RNG usage patterns but not exact
    keys; check distributional agreement on a fixed field."""
    from nerfjax.render import render_rays, render_rays_planar

    model = InstantNGP("small")
    params = model.init(jax.random.PRNGKey(0))
    # At init sigma ~= 0 everywhere; with dist_last=1e10 a 1e-7 fp wobble in
    # the final sample flips its alpha 0 -> 1. Scale the table so densities
    # are solidly nonzero and the comparison is numerically meaningful.
    params = dict(params, table=params["table"] * 300.0)
    B = 64
    rng = np.random.default_rng(0)
    o = rng.normal(size=(B, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.5
    d = -o
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    args = (
        jax.random.PRNGKey(3),
        jnp.asarray(o),
        jnp.asarray(d),
        jnp.full((B,), 1.5),
        jnp.full((B,), 3.5),
        16,
        16,
    )
    out_pm = render_rays(model, params, model, params, *args)
    out_fm = render_rays_planar(
        model, params, model, params, *args, dtype=jnp.float32
    )
    # identical keys -> identical stratified z -> coarse pass matches tightly
    np.testing.assert_allclose(
        np.asarray(out_fm["rgb_coarse"]), np.asarray(out_pm["rgb_coarse"]),
        atol=3e-3,
    )
    # fine pass: tiny fp diffs at CDF bin edges can flip individual
    # searchsorted picks -> allow a small fraction of outlier elements
    diff = np.abs(np.asarray(out_fm["rgb_fine"]) - np.asarray(out_pm["rgb_fine"]))
    assert (diff < 3e-3).mean() > 0.95, f"too many mismatches: {(diff >= 3e-3).mean():.2%}"
    assert np.median(diff) < 1e-3


def test_otsu_matches_reference_histogram():
    from nerfjax.ops.otsu import otsu_threshold

    rng = np.random.default_rng(0)
    # bimodal: background near 0, foreground near 5
    v = np.concatenate(
        [rng.normal(0.1, 0.05, 100_000), rng.normal(5.0, 0.5, 10_000)]
    ).astype(np.float32)
    t = float(otsu_threshold(jnp.asarray(v)))
    assert 0.3 < t < 4.5  # separates the modes
    occ = (v > t).mean()
    assert 0.05 < occ < 0.15


def test_stochastic_corner_gradient_unbiased():
    """grad_corners=k<8 scatters k weight-sampled corners with value g/k.
    Checks: (a) total mass is exactly preserved (every point contributes
    exactly g in total, since trilinear weights sum to 1), (b) the gradient
    lands only on entries the exact gradient touches, (c) over many random
    points the per-entry estimate matches the exact gradient (law of large
    numbers: each hash entry receives ~N*8/T contributions)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nerfjax.fields.ngp import HashGridSpec
    from nerfjax.ops.hash_encode import hash_encode_planar

    spec8 = HashGridSpec(n_levels=6, log2_hashmap_size=8, base_resolution=4,
                         per_level_scale=2.0, grad_corners=8)
    spec1 = dataclasses.replace(spec8, grad_corners=1)
    spec2 = dataclasses.replace(spec8, grad_corners=2)

    rng = np.random.default_rng(0)
    N = 20000
    x = jnp.asarray(rng.uniform(0.01, 0.99, N).astype(np.float32))
    y = jnp.asarray(rng.uniform(0.01, 0.99, N).astype(np.float32))
    z = jnp.asarray(rng.uniform(0.01, 0.99, N).astype(np.float32))
    planes = jnp.asarray(
        rng.uniform(-1e-2, 1e-2, (2, spec8.total_table_size)).astype(np.float32)
    )

    def loss(spec):
        def f(p):
            enc = hash_encode_planar(spec, p, x, y, z, dtype=jnp.float32)
            return jnp.sum(enc * 0.001)  # uniform cotangent
        return jax.grad(f)(planes)

    g_exact = np.asarray(loss(spec8))
    for spec_k, k in ((spec1, 1), (spec2, 2)):
        g_stoch = np.asarray(loss(spec_k))
        # (a) exact mass preservation per plane
        np.testing.assert_allclose(
            g_stoch.sum(axis=1), g_exact.sum(axis=1), rtol=1e-4
        )
        # (b) support subset: stochastic entries are a subset of exact's
        assert np.all((g_stoch != 0) <= (g_exact != 0)), k
        # (c) statistical agreement: correlation of per-entry gradients
        mask = g_exact[0] != 0
        corr = np.corrcoef(g_stoch[0][mask], g_exact[0][mask])[0, 1]
        assert corr > 0.55, (k, corr)


def test_grad_corners_flows_from_cfg():
    from nerfjax.config import ConfigNode, with_defaults
    from nerfjax.train import build_fields

    cfg = with_defaults(ConfigNode({"scene_name": "s", "ngp": True,
                                    "nerf_type": "small",
                                    "hash_grad_corners": 2}))
    fc, _, _ = build_fields(cfg)
    assert fc.spec.grad_corners == 2


def test_extra_dense_level_promotion_matches_oracle():
    """extra_dense_levels=1 promotes the first would-be-hashed level to a
    full res^3 dense table (collision-free, cell-row gathers, scatter-free
    backward). Fast path must still match the jnp oracle, which shares the
    same level_params and therefore the same promoted layout."""
    spec = HashGridSpec(log2_hashmap_size=15, extra_dense_levels=1)
    base = HashGridSpec(log2_hashmap_size=15)
    assert spec.total_table_size > base.total_table_size
    lp_base = base.level_params()
    lp = spec.level_params()
    flipped = [i for i in range(len(lp)) if lp[i]["use_hash"] != lp_base[i]["use_hash"]]
    assert len(flipped) == 1
    i = flipped[0]
    assert not lp[i]["use_hash"] and lp[i]["size"] >= lp[i]["res"] ** 3

    k = jax.random.PRNGKey(0)
    planes = jax.random.normal(k, (2, spec.total_table_size), jnp.float32) * 0.1
    x01 = jax.random.uniform(jax.random.PRNGKey(1), (129, 3))
    ref = hashgrid_encode(spec, planes, x01)
    fast = hash_encode_planar(
        spec, planes, x01[:, 0], x01[:, 1], x01[:, 2], dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(fast.T), np.asarray(ref), atol=2e-3, rtol=2e-2
    )

    # gradient flows into the promoted level's dense slice (scatter-free path)
    def loss_fast(p):
        enc = hash_encode_planar(
            spec, p, x01[:, 0], x01[:, 1], x01[:, 2], dtype=jnp.float32
        )
        return jnp.sum(enc**2)

    g = jax.grad(loss_fast)(planes)
    sl = slice(lp[i]["offset"], lp[i]["offset"] + lp[i]["size"])
    assert float(jnp.sum(jnp.abs(g[:, sl]))) > 0


def test_stochastic_forward_unbiased_and_consistent():
    """fwd_corners=k<8 is a dithered trilinear: per (level, point) it
    averages k corners drawn with probability = trilinear weight. Checks:
    (a) over many near-identical jittered positions the mean stochastic
    encode converges to the exact interpolation (unbiasedness — draws are
    keyed on position bits, so jitter decorrelates them), (b) the VJP is
    the exact gradient of the estimator (directional finite difference —
    the estimator is linear in the table, so central differences are
    exact up to float rounding), (c) gradient support is a subset of the
    exact-trilinear support with total mass exactly preserved."""
    import dataclasses

    spec8 = HashGridSpec(n_levels=6, log2_hashmap_size=8, base_resolution=4,
                         per_level_scale=2.0)
    rng = np.random.default_rng(1)
    planes = jnp.asarray(
        rng.uniform(-1e-2, 1e-2, (2, spec8.total_table_size)).astype(np.float32)
    )

    # (a) unbiasedness: one base point, 20k jitters of ~1e-6 (weights move
    # negligibly; position BITS — the draw seed — all differ).
    N = 20000
    base = np.asarray([0.4321, 0.6173, 0.2917], np.float32)
    jit = rng.uniform(0.0, 1e-6, (N, 3)).astype(np.float32)
    p = base[None, :] + jit
    x, y, z = (jnp.asarray(p[:, i]) for i in range(3))

    def enc(spec):
        return np.asarray(hash_encode_planar(spec, planes, x, y, z,
                                             dtype=jnp.float32))

    e_exact = enc(spec8)
    for k in (1, 2, 4):
        e_stoch = enc(dataclasses.replace(spec8, fwd_corners=k))
        # per-row (level-plane) mean over the 20k near-identical points
        diff = (e_stoch - e_exact).mean(axis=1)
        assert np.max(np.abs(diff)) < 5e-4, (k, diff)
        # and it IS stochastic: individual points differ from exact
        assert np.abs(e_stoch - e_exact).max() > 1e-4, k

    # (b) VJP == gradient of the estimator (fwd=2, grad_corners default 8
    # -> backward replays both forward draws with g/2).
    spec_f2 = dataclasses.replace(spec8, fwd_corners=2)
    xs, ys, zs = x[:64], y[:64], z[:64]

    def f(pl):
        return jnp.sum(hash_encode_planar(spec_f2, pl, xs, ys, zs,
                                          dtype=jnp.float32) * 0.001)

    g = np.asarray(jax.grad(f)(planes))
    d = jnp.asarray(rng.normal(size=planes.shape).astype(np.float32))
    eps = 1e-2
    fd = (float(f(planes + eps * d)) - float(f(planes - eps * d))) / (2 * eps)
    got = float(jnp.vdot(jnp.asarray(g), d))
    # bf16 table rounding makes f piecewise-constant in sub-bf16 moves of
    # individual entries; a large random direction averages that out.
    np.testing.assert_allclose(fd, got, rtol=5e-2, atol=1e-6)

    # (c) support subset + exact mass preservation vs exact trilinear grad
    def loss(spec):
        def f2(pl):
            return jnp.sum(hash_encode_planar(spec, pl, x, y, z,
                                              dtype=jnp.float32) * 0.001)
        return np.asarray(jax.grad(f2)(planes))

    g_exact = loss(spec8)
    for k in (1, 2):
        g_stoch = loss(dataclasses.replace(spec8, fwd_corners=k))
        np.testing.assert_allclose(g_stoch.sum(axis=1), g_exact.sum(axis=1),
                                   rtol=1e-4)
        assert np.all((g_stoch != 0) <= (g_exact != 0)), k


def test_fwd_corners_flows_from_cfg_train_only():
    """hash_fwd_corners reaches the spec ONLY via build_fields(train=True);
    eval/extract/checkpoint callers (default train=False) stay exact."""
    from nerfjax.config import ConfigNode, with_defaults
    from nerfjax.train import build_fields

    cfg = with_defaults(ConfigNode({"scene_name": "s", "ngp": True,
                                    "nerf_type": "small",
                                    "hash_fwd_corners": 2}))
    fc_eval, _, _ = build_fields(cfg)
    assert fc_eval.spec.fwd_corners == 8
    fc_train, _, _ = build_fields(cfg, train=True)
    assert fc_train.spec.fwd_corners == 2

    bad = with_defaults(ConfigNode({"scene_name": "s", "ngp": True,
                                    "hash_fwd_corners": 0}))
    with pytest.raises(ValueError):
        build_fields(bad, train=True)


def test_packed_row_gather_matches_take():
    """Forward: width-8 packed gather == width-16 take on bf16 rows (exact —
    the pack/unpack round-trip is lossless on bf16 values). Backward: the
    VJP is take's transpose, bit-for-bit."""
    from nerfjax.ops.hash_encode import _packed_row_gather

    k = jax.random.PRNGKey(0)
    rows = jax.random.normal(k, (97, 16), jnp.float32).astype(jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (333,), 0, 97)

    got = _packed_row_gather(rows, idx)
    want = jnp.take(rows, idx, axis=0)
    np.testing.assert_array_equal(
        np.asarray(got.astype(jnp.bfloat16)), np.asarray(want)
    )

    g = jax.random.normal(jax.random.PRNGKey(2), (333, 16), jnp.float32)

    def f_packed(r):
        return jnp.sum(_packed_row_gather(r, idx) * g)

    def f_take(r):
        return jnp.sum(jnp.take(r, idx, axis=0).astype(jnp.float32) * g)

    gp = jax.grad(f_packed)(rows)
    gt = jax.grad(f_take)(rows)
    np.testing.assert_allclose(
        np.asarray(gp, np.float32), np.asarray(gt, np.float32), rtol=0.05, atol=1e-2
    )


def test_dense_encode_bf16_packed_matches_fp32_path():
    """The bf16 dense path (now routed through the packed row gather) agrees
    with the fp32 dense path to bf16 tolerance, including at boundaries."""
    spec, planes, x01 = _setup(n=191)
    lo = hash_encode_planar(
        spec, planes, x01[:, 0], x01[:, 1], x01[:, 2], dtype=jnp.bfloat16
    )
    hi = hash_encode_planar(
        spec, planes, x01[:, 0], x01[:, 1], x01[:, 2], dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(lo, np.float32), np.asarray(hi, np.float32), atol=2e-2, rtol=5e-2
    )


def test_stochastic_dense_unbiased_and_consistent():
    """dense_corners=k<8 dithers the DENSE-level trilinear interpolation the
    same way fwd_corners dithers the hashed levels (round-5 lever: under k=1
    a dense point-level costs one ~7 ns pair gather instead of one ~21.5 ns
    cell-row gather — docs/PERF.md). Checks mirror
    test_stochastic_forward_unbiased_and_consistent, but for the dense
    prefix: (a) jitter-mean converges to the exact interpolation, (b) hashed
    rows are BIT-identical (the knob must not touch them), (c) the VJP
    preserves total gradient mass with support inside the exact support,
    (d) boundary clamping matches the exact path (points outside [0,1])."""
    import dataclasses

    spec8 = HashGridSpec(n_levels=6, log2_hashmap_size=8, base_resolution=4,
                         per_level_scale=2.0, extra_dense_levels=1)
    from nerfjax.ops.hash_encode import _split_levels

    dense, hashed = _split_levels(spec8)
    Ld, Lh = len(dense), len(hashed)
    assert Ld >= 2 and Lh >= 1, (Ld, Lh)
    L = Ld + Lh

    rng = np.random.default_rng(2)
    planes = jnp.asarray(
        rng.uniform(-1e-2, 1e-2, (2, spec8.total_table_size)).astype(np.float32)
    )

    N = 20000
    base = np.asarray([0.4321, 0.6173, 0.2917], np.float32)
    jit = rng.uniform(0.0, 1e-6, (N, 3)).astype(np.float32)
    p = base[None, :] + jit
    x, y, z = (jnp.asarray(p[:, i]) for i in range(3))

    def enc(spec):
        return np.asarray(hash_encode_planar(spec, planes, x, y, z,
                                             dtype=jnp.float32))

    e_exact = enc(spec8)
    dense_rows = np.r_[0:Ld, L:L + Ld]
    hash_rows = np.r_[Ld:L, L + Ld:2 * L]
    for k in (1, 2):
        e_stoch = enc(dataclasses.replace(spec8, dense_corners=k))
        # (a) unbiased on the dense rows
        diff = (e_stoch - e_exact)[dense_rows].mean(axis=1)
        assert np.max(np.abs(diff)) < 5e-4, (k, diff)
        assert np.abs((e_stoch - e_exact)[dense_rows]).max() > 1e-5, k
        # (b) hashed rows untouched
        np.testing.assert_array_equal(e_stoch[hash_rows], e_exact[hash_rows])

    # (c) gradient mass preserved, support subset (dense table prefix)
    T_dense = sum(lp["size"] for lp in dense)

    def grad(spec):
        def f(pl):
            return jnp.sum(hash_encode_planar(spec, pl, x, y, z,
                                              dtype=jnp.float32) * 0.001)
        return np.asarray(jax.grad(f)(planes))

    g_exact = grad(spec8)
    for k in (1, 2):
        g_stoch = grad(dataclasses.replace(spec8, dense_corners=k))
        np.testing.assert_allclose(
            g_stoch[:, :T_dense].sum(axis=1), g_exact[:, :T_dense].sum(axis=1),
            rtol=1e-4,
        )
        assert np.all(
            (g_stoch[:, :T_dense] != 0) <= (g_exact[:, :T_dense] != 0)
        ), k
        # hashed-table gradient identical
        np.testing.assert_array_equal(g_stoch[:, T_dense:], g_exact[:, T_dense:])

    # (d) clamp semantics at/beyond the boundary: the k=1 estimator must
    # draw only in-range corners and its jitter-mean must match the exact
    # clamped interpolation
    pb = np.clip(base + np.asarray([0.999, -0.5, 0.6], np.float32), -0.2, 1.2)
    jb = rng.uniform(0.0, 1e-6, (N, 3)).astype(np.float32)
    q = pb[None, :] + jb
    xb, yb, zb = (jnp.asarray(q[:, i]) for i in range(3))

    eb_exact = np.asarray(hash_encode_planar(spec8, planes, xb, yb, zb,
                                             dtype=jnp.float32))
    eb_stoch = np.asarray(
        hash_encode_planar(dataclasses.replace(spec8, dense_corners=1),
                           planes, xb, yb, zb, dtype=jnp.float32)
    )
    diff = (eb_stoch - eb_exact)[dense_rows].mean(axis=1)
    assert np.max(np.abs(diff)) < 5e-4, diff


def test_dense_corners_flows_from_cfg_train_only():
    from nerfjax.config import ConfigNode, with_defaults
    from nerfjax.train import build_fields

    cfg = with_defaults(ConfigNode({"scene_name": "s", "ngp": True,
                                    "nerf_type": "small",
                                    "hash_dense_corners": 1}))
    fc_eval, _, _ = build_fields(cfg)
    assert fc_eval.spec.dense_corners == 8
    fc_train, _, _ = build_fields(cfg, train=True)
    assert fc_train.spec.dense_corners == 1

    bad = with_defaults(ConfigNode({"scene_name": "s", "ngp": True,
                                    "hash_dense_corners": 9}))
    with pytest.raises(ValueError):
        build_fields(bad, train=True)


def test_grad_levels_subsample_unbiased():
    """hash_grad_levels=gl scatters only gl iid-drawn levels per point,
    scaled Lh/gl. Checks: (a) support subset of the k-corner plan's exact
    gradient, (b) total mass preserved in expectation (law of large
    numbers over 20k points), (c) per-entry statistical agreement with
    the exact gradient."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nerfjax.fields.ngp import HashGridSpec
    from nerfjax.ops.hash_encode import hash_encode_planar

    spec8 = HashGridSpec(n_levels=6, log2_hashmap_size=8, base_resolution=4,
                         per_level_scale=2.0, grad_corners=8)
    spec_gl = dataclasses.replace(spec8, grad_corners=1, grad_levels=2)

    rng = np.random.default_rng(1)
    N = 20000
    x = jnp.asarray(rng.uniform(0.01, 0.99, N).astype(np.float32))
    y = jnp.asarray(rng.uniform(0.01, 0.99, N).astype(np.float32))
    z = jnp.asarray(rng.uniform(0.01, 0.99, N).astype(np.float32))
    planes = jnp.asarray(
        rng.uniform(-1e-2, 1e-2, (2, spec8.total_table_size)).astype(np.float32)
    )

    def loss(spec):
        def f(p):
            enc = hash_encode_planar(spec, p, x, y, z, dtype=jnp.float32)
            return jnp.sum(enc * 0.001)
        return jax.grad(f)(planes)

    g_exact = np.asarray(loss(spec8))
    g_sub = np.asarray(loss(spec_gl))
    # (a) support subset of the exact gradient's
    assert np.all((g_sub != 0) <= (g_exact != 0))
    # (b) mass preserved in expectation (Lh/gl scaling); ~N/Lh draws per
    # level -> few-percent statistical tolerance
    np.testing.assert_allclose(
        g_sub.sum(axis=1), g_exact.sum(axis=1), rtol=0.08
    )
    # (c) per-entry statistical agreement
    mask = g_exact[0] != 0
    corr = np.corrcoef(g_sub[0][mask], g_exact[0][mask])[0, 1]
    assert corr > 0.5, corr
    # the hashed-level count here is 6 minus dense-capable levels; gl >= Lh
    # must be a no-op (identical to the gl=0 plan at the same corners)
    spec_k1 = dataclasses.replace(spec8, grad_corners=1)
    spec_big = dataclasses.replace(spec_k1, grad_levels=99)
    np.testing.assert_array_equal(np.asarray(loss(spec_big)),
                                  np.asarray(loss(spec_k1)))


def test_grad_levels_flows_from_cfg_train_only():
    import pytest

    from nerfjax.config import ConfigNode, with_defaults
    from nerfjax.train import build_fields

    cfg = with_defaults(ConfigNode({"scene_name": "s", "ngp": True,
                                    "nerf_type": "small",
                                    "hash_grad_corners": 1,
                                    "hash_grad_levels": 3}))
    fc, _, _ = build_fields(cfg, train=True)
    assert fc.spec.grad_levels == 3
    # eval/extract constructors never see the knob
    fc_eval, _, _ = build_fields(cfg, train=False)
    assert fc_eval.spec.grad_levels == 0
    # the exact 8-corner backward ignores level subsampling -> loud error
    bad = with_defaults(ConfigNode({"scene_name": "s", "ngp": True,
                                    "nerf_type": "small",
                                    "hash_grad_levels": 3}))
    with pytest.raises(ValueError, match="stochastic backward"):
        build_fields(bad, train=True)


def test_dense_grad_levels_subsample_unbiased():
    """hash_dense_grad_levels=gd: exact forward, but each point scatters
    only gd iid-drawn dense levels' row gradients, scaled Ld/gd. Checks:
    (a) the forward is BIT-IDENTICAL to the exact path (no activation
    noise), (b) gradient support is a subset of the exact gradient's,
    (c) total mass preserved in expectation, (d) per-entry statistical
    agreement, (e) gd >= Ld (and gd = 0) fall back to the exact path."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nerfjax.fields.ngp import HashGridSpec
    from nerfjax.ops.hash_encode import hash_encode_planar

    # base_res 4, scale 2 -> levels 4,7,13,25 dense (<= 2^15), rest hashed
    spec8 = HashGridSpec(n_levels=6, log2_hashmap_size=15, base_resolution=4,
                         per_level_scale=2.0)
    spec_gd = dataclasses.replace(spec8, dense_grad_levels=2)

    rng = np.random.default_rng(2)
    N = 20000
    x = jnp.asarray(rng.uniform(0.01, 0.99, N).astype(np.float32))
    y = jnp.asarray(rng.uniform(0.01, 0.99, N).astype(np.float32))
    z = jnp.asarray(rng.uniform(0.01, 0.99, N).astype(np.float32))
    planes = jnp.asarray(
        rng.uniform(-1e-2, 1e-2, (2, spec8.total_table_size)).astype(np.float32)
    )

    # (a) forward bit-identical to the exact path
    enc_exact = hash_encode_planar(spec8, planes, x, y, z, dtype=jnp.float32)
    enc_gd = hash_encode_planar(spec_gd, planes, x, y, z, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(enc_exact), np.asarray(enc_gd))

    def loss(spec):
        def f(p):
            enc = hash_encode_planar(spec, p, x, y, z, dtype=jnp.float32)
            return jnp.sum(enc * 0.001)
        return jax.grad(f)(planes)

    g_exact = np.asarray(loss(spec8))
    g_sub = np.asarray(loss(spec_gd))
    dense = [lp for lp in spec8.level_params() if not lp["use_hash"]]
    T_dense = sum(lp["size"] for lp in dense)
    # hashed-level grads are untouched by the dense subsampling
    np.testing.assert_array_equal(g_sub[:, T_dense:], g_exact[:, T_dense:])
    # (b) dense support subset of the exact gradient's
    d_sub, d_exact = g_sub[:, :T_dense], g_exact[:, :T_dense]
    assert np.all((d_sub != 0) <= (d_exact != 0))
    # (c) mass preserved in expectation (Ld/gd scaling); ~N*gd/Ld draws per
    # level -> few-percent statistical tolerance
    np.testing.assert_allclose(d_sub.sum(axis=1), d_exact.sum(axis=1),
                               rtol=0.08)
    # (d) per-entry statistical agreement
    mask = d_exact[0] != 0
    corr = np.corrcoef(d_sub[0][mask], d_exact[0][mask])[0, 1]
    assert corr > 0.5, corr
    # (e) gd >= Ld and gd = 0 are exact
    spec_big = dataclasses.replace(spec8, dense_grad_levels=99)
    np.testing.assert_array_equal(np.asarray(loss(spec_big)), g_exact)


def test_dense_grad_levels_flows_from_cfg_train_only():
    import pytest

    from nerfjax.config import ConfigNode, with_defaults
    from nerfjax.train import build_fields

    cfg = with_defaults(ConfigNode({"scene_name": "s", "ngp": True,
                                    "nerf_type": "small",
                                    "hash_dense_grad_levels": 2}))
    fc, _, _ = build_fields(cfg, train=True)
    assert fc.spec.dense_grad_levels == 2
    # eval/extract constructors never see the knob
    fc_eval, _, _ = build_fields(cfg, train=False)
    assert fc_eval.spec.dense_grad_levels == 0
    # the stochastic dense path owns its backward -> loud error combined
    bad = with_defaults(ConfigNode({"scene_name": "s", "ngp": True,
                                    "nerf_type": "small",
                                    "hash_dense_corners": 1,
                                    "hash_dense_grad_levels": 2}))
    with pytest.raises(ValueError, match="exact dense forward"):
        build_fields(bad, train=True)
