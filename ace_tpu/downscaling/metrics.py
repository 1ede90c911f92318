"""Downscaling generation-quality metrics, TPU-native (reference:
fme/downscaling/metrics_and_maths.py and the vendored piq PSNR/SSIM,
fme/downscaling/piq.py).

All functions operate on jnp arrays; SSIM's sliding window is a valid
(no-padding) depthwise convolution which XLA maps to fused MXU/VPU work.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-8


def min_max_normalization(x, min_, max_):
    """Normalize to [0, 1]; constant inputs return 0.5 (reference:
    metrics_and_maths.py:59)."""
    return jnp.where(
        min_ == max_, jnp.full_like(x, 0.5), (x - min_) / (max_ - min_)
    )


def _normalize_pair(x, y):
    # note: the reference's _normalize_tensors (metrics_and_maths.py:79)
    # has a typo returning the normalized x twice, which makes its
    # compute_psnr/compute_ssim degenerate (always-perfect scores). We
    # implement the clearly intended behavior: both tensors normalized
    # by their joint min/max.
    min_ = jnp.minimum(x.min(), y.min())
    max_ = jnp.maximum(x.max(), y.max())
    return (
        min_max_normalization(x, min_, max_),
        min_max_normalization(y, min_, max_),
    )


def get_sample_mae_estimate(prediction, sample_dim: int = 1):
    """E|X - X'| estimated over all cyclic sample pairings (reference:
    metrics_and_maths.py:126)."""
    n_samples = prediction.shape[sample_dim]
    if n_samples == 1:
        shape = list(prediction.shape)
        shape.pop(sample_dim)
        return jnp.full(shape, jnp.nan, prediction.dtype)
    est = 0.0
    for i in range(1, n_samples):
        est = est + jnp.abs(
            prediction - jnp.roll(prediction, shift=i, axis=sample_dim)
        ).mean(axis=sample_dim)
    return est / (n_samples - 1)


def compute_crps(target, prediction, sample_dim: int = 1):
    """CRPS(F, x) = E|X - x| - 1/2 E|X - X'| (reference:
    metrics_and_maths.py:87). ``target`` has no sample dimension."""
    target = jnp.expand_dims(target, sample_dim)
    truth_mae = jnp.abs(target - prediction).mean(axis=sample_dim)
    return truth_mae - 0.5 * get_sample_mae_estimate(prediction, sample_dim)


def compute_mae_error(target, prediction, sample_dim: int = 1):
    """Like CRPS but zero for a perfect (sharp, centered) forecast:
    E|X - x| - E|X - X'| (reference: metrics_and_maths.py:149)."""
    target = jnp.expand_dims(target, sample_dim)
    truth_mae = jnp.abs(target - prediction).mean(axis=sample_dim)
    return truth_mae - get_sample_mae_estimate(prediction, sample_dim)


def psnr(x, y, data_range: float = 1.0):
    """Peak signal-to-noise over [N, C, H, W] batches (reference:
    piq.py:311 psnr with reduction="mean")."""
    x = x / data_range
    y = y / data_range
    mse = jnp.mean((x - y) ** 2, axis=(1, 2, 3))
    return jnp.mean(-10.0 * jnp.log10(mse + _EPS))


def compute_psnr(prediction, target, add_channel_dim: bool):
    """Min-max-normalize the pair to [0, 1], then PSNR (reference:
    metrics_and_maths.py:175)."""
    prediction, target = _normalize_pair(prediction, target)
    if add_channel_dim:
        prediction = prediction[..., None, :, :]
        target = target[..., None, :, :]
    return psnr(prediction, target)


def _gaussian_kernel2d(kernel_size: int, sigma: float) -> np.ndarray:
    coords = np.arange(kernel_size, dtype=np.float64)
    coords -= (kernel_size - 1) / 2.0
    g = coords**2
    g = np.exp(-(g[None, :] + g[:, None]) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _depthwise_valid_conv(x, kernel2d):
    """x: [N, C, H, W]; kernel applied per channel, no padding."""
    n, c, h, w = x.shape
    k = kernel2d.shape[0]
    kern = jnp.broadcast_to(kernel2d, (c, 1, k, k))
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )


def ssim(x, y, kernel_size: int = 11, kernel_sigma: float = 1.5,
         data_range: float = 1.0, downsample: bool = True,
         k1: float = 0.01, k2: float = 0.03):
    """Structural similarity over [N, C, H, W] (reference: piq.py:395
    ssim with reduction="mean"; same avg-pool pre-downsampling and valid
    sliding gaussian window)."""
    if kernel_size % 2 != 1:
        raise ValueError(f"Kernel size must be odd, got {kernel_size}")
    x = x / data_range
    y = y / data_range
    f = max(1, round(min(x.shape[-2:]) / 256))
    if f > 1 and downsample:
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 1, f, f), (1, 1, f, f), "VALID"
        ) / (f * f)
        y = jax.lax.reduce_window(
            y, 0.0, jax.lax.add, (1, 1, f, f), (1, 1, f, f), "VALID"
        ) / (f * f)
    kern = jnp.asarray(_gaussian_kernel2d(kernel_size, kernel_sigma))
    conv = functools.partial(_depthwise_valid_conv, kernel2d=kern)
    c1, c2 = k1**2, k2**2
    mu_x = conv(x)
    mu_y = conv(y)
    mu_xx, mu_yy, mu_xy = mu_x**2, mu_y**2, mu_x * mu_y
    sigma_xx = conv(x**2) - mu_xx
    sigma_yy = conv(y**2) - mu_yy
    sigma_xy = conv(x * y) - mu_xy
    cs = (2.0 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ss = (2.0 * mu_xy + c1) / (mu_xx + mu_yy + c1) * cs
    # per-channel spatial mean, then channel mean, then batch mean
    return jnp.mean(ss.mean(axis=(-1, -2)).mean(axis=1))


def compute_ssim(prediction, target, add_channel_dim: bool, **kwargs):
    """Min-max-normalize the pair to [0, 1], then SSIM (reference:
    metrics_and_maths.py:196)."""
    prediction, target = _normalize_pair(prediction, target)
    if add_channel_dim:
        prediction = prediction[..., None, :, :]
        target = target[..., None, :, :]
    return ssim(prediction, target, **kwargs)


def compute_zonal_power_spectrum(x):
    """rFFT power along longitude, negative-wavenumber doubled, averaged
    over latitude (reference: metrics_and_maths.py:223)."""
    if x.ndim < 2:
        raise ValueError(
            f"Input must have at least 2 dims (lat, lon); got {x.shape}"
        )
    uhat = jnp.fft.rfft(x, axis=-1)
    power = jnp.real(uhat * jnp.conj(uhat))
    doubling = jnp.concatenate(
        [jnp.ones((1,)), jnp.full((power.shape[-1] - 1,), 2.0)]
    )
    return (power * doubling).mean(axis=-2)


def compute_rank(target, prediction, sample_dim: int = 1):
    """Rank of the target within the prediction ensemble: count of members
    <= target (reference: metrics_and_maths.py:264; Hamill 2001)."""
    target = jnp.expand_dims(target, sample_dim)
    return (prediction <= target).sum(axis=sample_dim)


def interpolate_bicubic(x, scale_factor: int):
    """Bicubic upsampling baseline for the relative-CRPS/MSE metrics.

    Note: uses jax.image.resize (half-pixel sampling), which differs
    slightly from the reference's torch ``align_corners=True`` bicubic
    (metrics_and_maths.py:255) at the outermost pixels; the relative
    metrics are insensitive to this boundary convention.
    """
    out_shape = (
        *x.shape[:-2],
        x.shape[-2] * scale_factor,
        x.shape[-1] * scale_factor,
    )
    return jax.image.resize(x, out_shape, method="bicubic")


class GenerationMetricsAggregator:
    """Streaming generation-quality metrics over evaluation batches
    (reference: fme/downscaling/aggregators/generation.py
    GenerationAggregator + RelativeCRPSInterpAggregator + the main
    Aggregator's relative-MSE/zonal-spectrum comparisons and
    sample.py's rank histogram).

    record_batch(target [B, H, W], prediction [B, S, H, W],
    coarse [B, h, w]) per variable.
    """

    def __init__(self, downscale_factor: int):
        self._factor = downscale_factor
        self._n = 0
        self._sums: dict[str, dict[str, float]] = {}
        self._maps: dict[str, dict[str, np.ndarray]] = {}
        self._spectra: dict[str, dict[str, jnp.ndarray]] = {}
        self._ranks: dict[str, np.ndarray] = {}
        # per-batch device reductions, drained in one parallel D2H at
        # finalization (see aggregator/inference.py docstring)
        self._pending: list = []
        self._compute = None

    def _compute_impl(self, target, prediction, coarse):
        out: dict[str, dict] = {}
        for k, pred in prediction.items():
            if k not in target:
                continue
            tgt = jnp.asarray(target[k])          # [B, H, W]
            pred = jnp.asarray(pred)              # [B, S, H, W]
            n_samples = pred.shape[1]
            entry: dict = {
                "crps_map": jnp.mean(compute_crps(tgt, pred), axis=0),
            }
            # bicubic-upsampled coarse baseline (deterministic: CRPS = MAE)
            if k in coarse:
                interp = interpolate_bicubic(
                    jnp.asarray(coarse[k]), self._factor
                )
                entry["interp_mae_map"] = jnp.mean(
                    jnp.abs(tgt - interp), axis=0
                )
                entry["interp_mse"] = jnp.mean((tgt - interp) ** 2)
                entry["spectrum_coarse"] = (
                    compute_zonal_power_spectrum(interp).mean(axis=0)
                )
            folded = pred.reshape(-1, *pred.shape[2:])  # [B*S, H, W]
            tgt_rep = jnp.repeat(tgt, n_samples, axis=0)
            entry["mse"] = jnp.mean((folded - tgt_rep) ** 2)
            entry["psnr"] = compute_psnr(folded, tgt_rep, True)
            if min(folded.shape[-2:]) >= 11:
                entry["ssim"] = compute_ssim(folded, tgt_rep, True)
            entry["spectrum_prediction"] = (
                compute_zonal_power_spectrum(folded).mean(axis=0)
            )
            entry["spectrum_target"] = (
                compute_zonal_power_spectrum(tgt).mean(axis=0)
            )
            # rank histogram counts (n_samples+1 possible ranks)
            ranks = compute_rank(tgt, pred).ravel()
            entry["rank_counts"] = jnp.bincount(
                ranks, length=n_samples + 1
            )
            out[k] = entry
        return out

    def record_batch(self, target, prediction, coarse):
        import jax

        self._n += 1
        if self._compute is None:
            self._compute = jax.jit(self._compute_impl)
        self._pending.append(self._compute(
            dict(target), dict(prediction), dict(coarse)
        ))

    def _acc(self, key, metric, value):
        d = self._sums.setdefault(key, {})
        d[metric] = d.get(metric, 0.0) + float(value)

    def _drain(self):
        if not self._pending:
            return
        import jax

        for batch in jax.device_get(self._pending):
            for k, entry in batch.items():
                crps_map = entry["crps_map"]
                self._acc(k, "crps", crps_map.mean())
                kmaps = self._maps.setdefault(k, {})
                kmaps["crps"] = kmaps.get("crps", 0.0) + crps_map
                if "interp_mae_map" in entry:
                    mae_map = entry["interp_mae_map"]
                    kmaps["interp_mae"] = (
                        kmaps.get("interp_mae", 0.0) + mae_map
                    )
                    self._acc(k, "interp_mae", mae_map.mean())
                    self._acc(k, "interp_mse", entry["interp_mse"])
                self._acc(k, "mse", entry["mse"])
                self._acc(k, "psnr", entry["psnr"])
                if "ssim" in entry:
                    self._acc(k, "ssim", entry["ssim"])
                sp = self._spectra.setdefault(k, {})
                for src in ("prediction", "target", "coarse"):
                    key = f"spectrum_{src}"
                    if key in entry:
                        sp[src] = sp.get(src, 0.0) + entry[key]
                self._ranks[k] = (
                    self._ranks.get(k, 0) + entry["rank_counts"]
                )
        self._pending = []

    def get_logs(self, label: str = "generation") -> dict[str, float]:
        self._drain()
        logs = {}
        for k, d in self._sums.items():
            crps = d.get("crps", np.nan) / self._n
            logs[f"{label}/metrics/crps/{k}"] = crps
            logs[f"{label}/metrics/rmse/{k}"] = float(
                np.sqrt(d.get("mse", np.nan) / self._n)
            )
            logs[f"{label}/metrics/psnr/{k}"] = d.get("psnr", np.nan) / self._n
            if "ssim" in d:
                logs[f"{label}/metrics/ssim/{k}"] = d["ssim"] / self._n
            if "interp_mae" in d:
                # mean of the per-pixel CRPS/MAE ratio map (reference
                # RelativeCRPSInterpAggregator._get divides the maps
                # before averaging, generation.py:151,175)
                kmaps = self._maps[k]
                ratio_map = kmaps["crps"] / np.maximum(
                    kmaps["interp_mae"], 1e-30
                )
                logs[f"{label}/metrics/relative_crps_bicubic/{k}"] = (
                    float(ratio_map.mean())
                )
                logs[f"{label}/metrics/relative_mse_bicubic/{k}"] = (
                    (d["mse"] / self._n) / (d["interp_mse"] / self._n)
                )
        return logs

    def get_diagnostics(self) -> dict[str, np.ndarray]:
        self._drain()
        out = {}
        for k, sp in self._spectra.items():
            for src, v in sp.items():
                out[f"zonal_power_spectrum_{src}-{k}"] = (
                    np.asarray(v) / self._n
                )
        for k, counts in self._ranks.items():
            out[f"rank_histogram-{k}"] = np.asarray(counts)
        return out
