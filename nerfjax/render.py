"""Volumetric rendering: stratified sampling, inverse-CDF importance
sampling, and alpha compositing.

Pure, key-driven jnp reimplementation of the reference renderer
(reference: scripts/sampling.py:4-49, scripts/train.py:31-106). Everything is
shape-static and jit-safe: fixed N_samples / N_importance, `searchsorted` +
gathers for the CDF inversion, `lax.stop_gradient` where the reference
detaches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_sample(
    key: jax.Array,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    n_samples: int,
    u: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Jittered linear-in-depth samples along each ray.

    Args:
      rays_o, rays_d: [B,3]; near, far: [B] or [B,1].
      u: optional externally-supplied uniforms [B,S] (parity tests share
        these with the torch reference); default draws from `key`.
    Returns:
      pts [B,S,3], z_vals [B,S].

    Parity: reference scripts/sampling.py:10-32 — linspace in [near,far],
    then uniform jitter within mid-point bins.
    """
    near = near.reshape(-1, 1)
    far = far.reshape(-1, 1)
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=rays_o.dtype)[None, :]
    z = near * (1.0 - t) + far * t  # [B,S]

    mids = 0.5 * (z[..., 1:] + z[..., :-1])
    upper = jnp.concatenate([mids, z[..., -1:]], axis=-1)
    lower = jnp.concatenate([z[..., :1], mids], axis=-1)
    if u is None:
        u = jax.random.uniform(key, z.shape, z.dtype)
    z = lower + (upper - lower) * u

    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    return pts, z


def sample_pdf(
    key: jax.Array,
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    u: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Inverse-transform sampling from a piecewise-constant PDF.

    Args:
      bins: [B, M] bin edges; weights: [B, M-1] non-negative.
      u: optional externally-supplied uniforms [B, n_samples] (parity tests
        share these with the torch reference); default draws from `key`.
    Returns:
      samples [B, n_samples] (NOT stop-gradiented; callers mirror the
      reference's `.detach()` explicitly).

    Parity: reference scripts/train.py:31-75.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [B, M]

    if u is None:
        u = jax.random.uniform(key, (*cdf.shape[:-1], n_samples), cdf.dtype)

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.clip(inds - 1, 0, cdf.shape[-1] - 1)
    above = jnp.clip(inds, 0, cdf.shape[-1] - 1)

    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, below, axis=-1)
    bins_a = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def merge_z_vals(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_coarse: jnp.ndarray,
    z_importance: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sort-merge coarse + importance depths and re-derive sample points.

    Parity: reference scripts/sampling.py:34-49 (StratifiedSampler.fine_points).
    Returns pts [B, S+I, 3], z_vals [B, S+I].
    """
    z = jnp.sort(jnp.concatenate([z_coarse, z_importance], axis=-1), axis=-1)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    return pts, z


def raw2outputs(
    rgb: jnp.ndarray,
    sigma: jnp.ndarray,
    z_vals: jnp.ndarray,
    white_bg: bool = False,
    dist_last: float = 1e10,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Alpha compositing of per-sample (rgb, sigma) into per-ray color.

    Args:
      rgb [B,S,3], sigma [B,S,1] or [B,S], z_vals [B,S].
      dist_last: pseudo-distance past the final sample (the reference uses
        1e10 in the AMP trainer and 1e6 in the fp32 twin — scripts/train.py:85
        vs scripts/train_no_amp.py:84; configurable here).
    Returns:
      rgb_map [B,3], weights [B,S].

    Parity: reference scripts/train.py:78-106.
    """
    sigma = sigma.reshape(*z_vals.shape)
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], dist_last)], axis=-1
    )

    alpha = 1.0 - jnp.exp(-sigma * dists)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1),
        axis=-1,
    )[..., :-1]
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    if white_bg:
        acc = jnp.sum(weights, axis=-1)
        rgb_map = rgb_map + (1.0 - acc[..., None])
    return rgb_map, weights


def raw2outputs_planar(
    rgb: jnp.ndarray,
    sigma: jnp.ndarray,
    z_vals: jnp.ndarray,
    white_bg: bool = False,
    dist_last: float = 1e10,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Feature-major twin of raw2outputs: rgb [3,B,S], sigma [B,S] ->
    (rgb_map [B,3], weights [B,S]). Compositing runs in fp32 ([B,S] tiles
    are lane-aligned for typical S)."""
    sigma = sigma.astype(jnp.float32)
    rgb = rgb.astype(jnp.float32)
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], dist_last)], axis=-1)
    alpha = 1.0 - jnp.exp(-sigma * dists)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1),
        axis=-1,
    )[..., :-1]
    weights = alpha * trans
    rgb_map = jnp.einsum("bs,cbs->bc", weights, rgb)
    if white_bg:
        acc = jnp.sum(weights, axis=-1)
        rgb_map = rgb_map + (1.0 - acc[..., None])
    return rgb_map, weights


def render_rays_planar(
    field_coarse,
    params_coarse,
    field_fine,
    params_fine,
    key: jax.Array,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t_near: jnp.ndarray,
    t_far: jnp.ndarray,
    n_samples: int,
    n_importance: int,
    white_bg: bool = False,
    train: bool = False,
    dist_last: float = 1e10,
    remat: bool = True,
    dtype=jnp.bfloat16,
    occ_spec=None,
    occ_grid=None,
    single_pass: bool = False,
) -> dict[str, jnp.ndarray]:
    """Feature-major hierarchical render — the TPU hot path.

    Same math as render_rays, but positions/directions flow as [N] component
    vectors and activations as [C, N], eliminating the lane-padding waste of
    [N,3]/[N,C<128] layouts (see nerfjax.ops.hash_encode docstring).

    With (occ_spec, occ_grid) the coarse depths come from occupancy-weighted
    inverse-CDF sampling instead of uniform stratification (empty-space
    skipping; nerfjax.ops.occupancy) — the capability the reference's
    Instant-NGP integration dropped.

    single_pass=True drops the coarse network pass entirely (instant-ngp's
    actual design: the acceleration structure, not a coarse MLP, proposes
    the samples): all n_samples + n_importance depths come from the
    occupancy CDF (or uniform stratification without a grid) and only the
    fine field is evaluated. rgb_coarse aliases the fine output with its
    gradient stopped so downstream API shapes are unchanged.
    """
    B = rays_o.shape[0]
    k_strat, k_pdf, k_noise_c, k_noise_f = jax.random.split(key, 4)

    ox, oy, oz = rays_o[:, 0], rays_o[:, 1], rays_o[:, 2]
    dx, dy, dz = rays_d[:, 0], rays_d[:, 1], rays_d[:, 2]

    def eval_field(field, params, z, k):
        S = z.shape[-1]
        pos3 = tuple(
            (o[:, None] + d[:, None] * z).reshape(-1)
            for o, d in ((ox, dx), (oy, dy), (oz, dz))
        )
        view3 = tuple(jnp.broadcast_to(d[:, None], (B, S)).reshape(-1) for d in (dx, dy, dz))
        # Inference on TPU goes through the fused Pallas MLP head — the XLA
        # path can hit a pathological emitter (~100x slower) depending on how
        # positions were derived; see docs/PERF.md.
        if (
            not train
            and hasattr(field, "apply_planar_fused")
            and jax.default_backend() == "tpu"
        ):
            rgb, sigma = field.apply_planar_fused(params, pos3, view3, dtype=dtype)
        else:
            rgb, sigma = field.apply_planar(
                params, pos3, view3, rng=k, train=train, dtype=dtype
            )
        return rgb.reshape(3, B, S), sigma.reshape(B, S)

    def eval_coarse(params, z, k):
        return eval_field(field_coarse, params, z, k)

    def eval_fine(params, z, k):
        return eval_field(field_fine, params, z, k)

    if remat and train:
        # Save the hash-encode outputs across the remat boundary (their
        # recompute is 100M+ random gathers); recompute everything else.
        policy = jax.checkpoint_policies.save_only_these_names("hash_enc")
        eval_coarse = jax.checkpoint(eval_coarse, policy=policy)
        eval_fine = jax.checkpoint(eval_fine, policy=policy)

    n_first = (n_samples + n_importance) if single_pass else n_samples
    if occ_spec is not None and occ_grid is not None:
        from nerfjax.ops.occupancy import occupancy_sample

        z = occupancy_sample(
            occ_spec, occ_grid, k_strat, rays_o, rays_d, t_near, t_far, n_first
        )
    else:
        # stratified z (same math as stratified_sample, z-only)
        near = t_near.reshape(-1, 1)
        far = t_far.reshape(-1, 1)
        t = jnp.linspace(0.0, 1.0, n_first, dtype=jnp.float32)[None, :]
        z = near * (1.0 - t) + far * t
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = jnp.concatenate([mids, z[..., -1:]], axis=-1)
        lower = jnp.concatenate([z[..., :1], mids], axis=-1)
        z = lower + (upper - lower) * jax.random.uniform(k_strat, z.shape, z.dtype)

    if single_pass:
        rgb_f, sigma_f = eval_fine(params_fine, z, k_noise_f)
        rgb_map_f, weights_f = raw2outputs_planar(rgb_f, sigma_f, z, white_bg, dist_last)
        return {
            "rgb_coarse": jax.lax.stop_gradient(rgb_map_f),
            "rgb_fine": rgb_map_f,
            "weights_coarse": jax.lax.stop_gradient(weights_f),
            "weights_fine": weights_f,
            "z_vals": z,
        }

    rgb_c, sigma_c = eval_coarse(params_coarse, z, k_noise_c)
    rgb_map_c, weights = raw2outputs_planar(rgb_c, sigma_c, z, white_bg, dist_last)

    z_mid = 0.5 * (z[..., :-1] + z[..., 1:])
    z_imp = sample_pdf(k_pdf, z_mid, weights[..., 1:-1], n_importance)
    z_imp = jax.lax.stop_gradient(z_imp)
    z_comb = jnp.sort(jnp.concatenate([z, z_imp], axis=-1), axis=-1)

    rgb_f, sigma_f = eval_fine(params_fine, z_comb, k_noise_f)
    rgb_map_f, weights_f = raw2outputs_planar(rgb_f, sigma_f, z_comb, white_bg, dist_last)

    return {
        "rgb_coarse": rgb_map_c,
        "rgb_fine": rgb_map_f,
        "weights_coarse": weights,
        "weights_fine": weights_f,
        "z_vals": z_comb,
    }


def render_rays(
    field_coarse,
    params_coarse,
    field_fine,
    params_fine,
    key: jax.Array,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t_near: jnp.ndarray,
    t_far: jnp.ndarray,
    n_samples: int,
    n_importance: int,
    white_bg: bool = False,
    train: bool = False,
    dist_last: float = 1e10,
    remat: bool = True,
) -> dict[str, jnp.ndarray]:
    """Hierarchical coarse->fine render of a ray batch, fully jit-traceable.

    Collapses the reference's forward_pass (scripts/train.py:129-186) —
    including its python chunking loop — into straight-line XLA: the
    [B*S, 3] point tensors go through the field in one shot and XLA tiles
    them onto the MXU.

    remat: rematerialize the per-point field evaluations in the backward
    pass (jax.checkpoint). The hash-encode gather produces [B*S, L, 8, F]
    intermediates that would otherwise be saved for grad — at the blender
    operating point (8192 rays x 192 fine samples) that overflows HBM;
    recomputing them trades cheap FLOPs for ~10x less live memory.
    """
    B = rays_o.shape[0]
    k_strat, k_pdf, k_noise_c, k_noise_f = jax.random.split(key, 4)

    def eval_coarse(p, x, d, k):
        return field_coarse.apply(p, x, d, rng=k, train=train)

    def eval_fine(p, x, d, k):
        return field_fine.apply(p, x, d, rng=k, train=train)

    if remat and train:
        eval_coarse = jax.checkpoint(eval_coarse)
        eval_fine = jax.checkpoint(eval_fine)

    pts, z_vals = stratified_sample(k_strat, rays_o, rays_d, t_near, t_far, n_samples)
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)

    rgb_c, sigma_c = eval_coarse(
        params_coarse, pts.reshape(-1, 3), dirs.reshape(-1, 3), k_noise_c
    )
    rgb_c = rgb_c.reshape(B, n_samples, 3)
    sigma_c = sigma_c.reshape(B, n_samples)
    rgb_map_c, weights = raw2outputs(rgb_c, sigma_c, z_vals, white_bg, dist_last)

    z_mid = 0.5 * (z_vals[..., :-1] + z_vals[..., 1:])
    z_imp = sample_pdf(k_pdf, z_mid, weights[..., 1:-1], n_importance)
    z_imp = jax.lax.stop_gradient(z_imp)  # reference .detach() (train.py:159)

    pts_f, z_comb = merge_z_vals(rays_o, rays_d, z_vals, z_imp)
    S = n_samples + n_importance
    dirs_f = jnp.broadcast_to(rays_d[:, None, :], pts_f.shape)

    rgb_f, sigma_f = eval_fine(
        params_fine, pts_f.reshape(-1, 3), dirs_f.reshape(-1, 3), k_noise_f
    )
    rgb_f = rgb_f.reshape(B, S, 3)
    sigma_f = sigma_f.reshape(B, S)
    rgb_map_f, weights_f = raw2outputs(rgb_f, sigma_f, z_comb, white_bg, dist_last)

    return {
        "rgb_coarse": rgb_map_c,
        "rgb_fine": rgb_map_f,
        "weights_coarse": weights,
        "weights_fine": weights_f,
        "z_vals": z_comb,
    }
