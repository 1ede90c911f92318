"""Loss library (reference: fme/core/loss.py, fme/core/ensemble.py).

All losses operate on packed channels-LAST arrays (``[batch, (ensemble,)
lat, lon, channel]``), reduce to per-channel ``(batch, channel)`` tensors,
and combine as the channel-mean of batch-means — matching the reference's
``LossOutput.total()`` semantics. Variable weights multiply the normalized
inputs before the loss (reference VariableWeightingLoss, loss.py:439).

Ensemble scores: almost-fair CRPS (arXiv:2412.15832) and the spectral
energy score over SHT coefficients (reference: ensemble.py:4,47).
"""

import dataclasses
from typing import Any, Callable, Literal, Mapping

import jax
import jax.numpy as jnp

from ace_tpu.core.normalizer import StandardNormalizer
from ace_tpu.core.typing_ import TensorMapping

CHANNEL_DIM = -1
_ELEMENTWISE = "elementwise"


@dataclasses.dataclass
class LossOutput:
    """Total loss and per-channel breakdown.

    ``per_channel`` is a (batch-reduced) [channel] array; ``total`` the
    scalar optimization target (mean over channels).
    """

    total: jnp.ndarray
    per_channel: dict[str, jnp.ndarray]

    def scale(self, weight) -> "LossOutput":
        return LossOutput(
            total=self.total * weight,
            per_channel={k: v * weight for k, v in self.per_channel.items()},
        )


def _reduce_to_channel(loss_elem: jnp.ndarray) -> jnp.ndarray:
    """Reduce [B, ..., C] elementwise loss to (B, C)."""
    if loss_elem.ndim <= 2:
        return loss_elem
    dims = tuple(range(1, loss_elem.ndim - 1))
    return jnp.mean(loss_elem, axis=dims)


class MSELoss:
    def __call__(self, x, y):
        return _reduce_to_channel((x - y) ** 2)


class L1Loss:
    def __call__(self, x, y):
        return _reduce_to_channel(jnp.abs(x - y))


class AreaWeightedMSELoss:
    """MSE with an area-weighted spatial mean (reference: loss.py:356
    builds from gridded_operations.area_weighted_mean, so it works for
    both lat-lon and HEALPix layouts)."""

    def __init__(self, area_weighted_mean_channels_last):
        self._awm = area_weighted_mean_channels_last

    def __call__(self, x, y):
        sq = (x - y) ** 2
        weighted = self._awm(sq)
        # reduce any remaining middle dims (e.g. ensemble) to (B, C)
        return _reduce_to_channel(weighted)


class LpLoss:
    """Relative Lp-norm loss per (batch, channel) (reference: loss.py:334)."""

    def __init__(self, p: int = 2):
        self.p = p

    def __call__(self, x, y):
        dims = tuple(range(1, x.ndim - 1))
        diff_norms = jnp.sum(jnp.abs(x - y) ** self.p, axis=dims) ** (
            1.0 / self.p
        )
        y_norms = jnp.sum(jnp.abs(y) ** self.p, axis=dims) ** (1.0 / self.p)
        return diff_norms / y_norms


class GlobalMeanLoss:
    """Loss applied to the area-weighted global mean of each sample
    (reference: loss.py:392).
    """

    def __init__(self, area_weighted_mean_channels_last, loss):
        self._awm = area_weighted_mean_channels_last
        self._loss = loss

    def __call__(self, x, y):
        return self._loss(self._awm(x), self._awm(y))


def get_crps(gen, target, alpha: float = 1.0):
    """Almost-fair CRPS over the ensemble axis (axis=1)
    (reference: fme/core/ensemble.py:4).

    gen: [B, E, ...]; target: [B, 1, ...]. Returns [B, ...].
    """
    n_ens = gen.shape[1]
    epsilon = (1.0 - alpha) / 2.0
    target_term = jnp.mean(jnp.abs(gen - target), axis=1)
    if n_ens == 1:
        internal_term = jnp.zeros_like(target_term)
    else:
        pairs = [
            jnp.abs(gen[:, i] - gen[:, j])
            for i in range(n_ens)
            for j in range(i + 1, n_ens)
        ]
        internal_term = -0.5 * sum(pairs) / len(pairs)
    return target_term + (1.0 - epsilon) * internal_term


def get_energy_score(gen, target):
    """Energy score over complex coefficients, 2 ensemble members
    (reference: fme/core/ensemble.py:47).
    """
    if gen.shape[1] != 2:
        raise NotImplementedError(
            f"energy score requires exactly 2 ensemble members, got {gen.shape[1]}"
        )
    target_term = jnp.mean(jnp.abs(gen - target), axis=1)
    internal_term = -0.5 * jnp.abs(gen[:, 0] - gen[:, 1])
    return target_term + internal_term


class CRPSLoss:
    def __init__(self, alpha: float = 1.0):
        self.alpha = alpha

    def __call__(self, x, y):
        # x: [B, E, lat, lon, C]; y: [B, 1, lat, lon, C]
        return _reduce_to_channel(get_crps(x, y, alpha=self.alpha))


class FiniteDifferenceCRPSLoss:
    """CRPS of spatial finite differences (reference: loss.py:655).

    Operates on [B, E, lat, lon, C]; lat/lon are axes -3/-2.
    """

    def __init__(self, alpha: float = 1.0, levels: int = 1):
        if levels < 1:
            raise ValueError(f"levels must be at least 1, got {levels}")
        self.alpha = alpha
        self.levels = levels

    def _level(self, x, y, levels):
        x_dlat = x[..., 1:, :, :] - x[..., :-1, :, :]
        y_dlat = y[..., 1:, :, :] - y[..., :-1, :, :]
        crps_lat = _reduce_to_channel(get_crps(x_dlat, y_dlat, self.alpha))
        x_dlon = jnp.roll(x, shift=-1, axis=-2) - x
        y_dlon = jnp.roll(y, shift=-1, axis=-2) - y
        crps_lon = _reduce_to_channel(get_crps(x_dlon, y_dlon, self.alpha))
        out = 0.5 * (crps_lat + crps_lon)
        if levels > 1:
            out = out + self._level(
                _avg_pool2(x), _avg_pool2(y), levels - 1
            )
        return out

    def __call__(self, x, y):
        return self._level(x, y, self.levels) / self.levels


def _avg_pool2(x):
    """2x2 average pool over (lat, lon) axes (-3, -2), ceil mode."""
    h, w = x.shape[-3], x.shape[-2]
    pad_h, pad_w = h % 2, w % 2
    if pad_h or pad_w:
        pad = [(0, 0)] * x.ndim
        pad[-3] = (0, pad_h)
        pad[-2] = (0, pad_w)
        x = jnp.pad(x, pad, mode="edge")
        h, w = h + pad_h, w + pad_w
    x = x.reshape(*x.shape[:-3], h // 2, 2, w // 2, 2, x.shape[-1])
    return jnp.mean(x, axis=(-4, -2))


@dataclasses.dataclass
class SpectralWhiteningConfig:
    """Per-sample spectral whitening of the energy score
    (reference: fme/core/loss.py:519 SpectralWhiteningConfig).
    """

    kind: Literal["none", "per_sample"] = "none"
    eps_frac: float | None = None
    exponent: float | None = None

    def __post_init__(self):
        # (reference loss.py:519 __post_init__ validation)
        if self.kind == "none":
            if self.eps_frac is not None or self.exponent is not None:
                raise ValueError(
                    "spectral whitening kind='none' accepts no "
                    "eps_frac/exponent parameters"
                )
            return
        if self.exponent is not None and not 0.0 < self.exponent <= 1.0:
            raise ValueError(
                f"whitening exponent must be in (0, 1]: {self.exponent}"
            )
        if self.eps_frac is not None and self.eps_frac <= 0.0:
            raise ValueError(
                f"whitening eps_frac must be > 0: {self.eps_frac}"
            )

    def build(self):
        if self.kind == "none":
            return None
        return SpectralWhitening(
            eps_frac=self.eps_frac if self.eps_frac is not None else 0.02,
            exponent=self.exponent if self.exponent is not None else 0.5,
        )


class SpectralWhitening:
    """Per-sample per-degree reweighting ``(1/amp_l)**exponent`` with
    magnitude preservation (reference: fme/core/loss.py:455).

    Operates on coefficients [B, 1(ens), L, M, C]; returns a factor
    [B, L, 1, C] broadcast over order m.
    """

    def __init__(self, eps_frac: float = 0.02, exponent: float = 0.5):
        self.eps_frac = eps_frac
        self.exponent = exponent

    def factor(self, y_hat):
        yt = jax.lax.stop_gradient(y_hat)[:, 0]  # (B, L, M, C)
        amp_mode = jnp.abs(yt)
        n_l, n_m = yt.shape[-3], yt.shape[-2]
        l_idx = jnp.arange(n_l)[:, None]
        m_idx = jnp.arange(n_m)[None, :]
        valid = (m_idx <= l_idx).astype(amp_mode.dtype)
        redundancy = jnp.full((n_l, n_m), 2.0).at[:, 0].set(1.0)
        w = (redundancy * valid)[..., None]  # (L, M, 1)
        tiny = jnp.finfo(amp_mode.dtype).tiny
        meanpow_l = jnp.sum(amp_mode**2 * w, axis=-2) / jnp.maximum(
            jnp.sum(w, axis=-2), tiny
        )  # (B, L, C)
        amp_l = jnp.sqrt(meanpow_l)
        mean_amp = jnp.mean(amp_l, axis=-2, keepdims=True)
        f = 1.0 / jnp.maximum(amp_l, self.eps_frac * mean_amp)
        if self.exponent != 1.0:
            f = f**self.exponent
        f_m = f[:, :, None, :]  # (B, L, 1, C), broadcast over m
        num = jnp.sum(w * amp_mode, axis=(-3, -2), keepdims=True)
        den = jnp.sum(w * f_m * amp_mode, axis=(-3, -2), keepdims=True)
        alpha = num / (den + tiny)
        return alpha * f_m  # (B, L, 1, C)


class EnergyScoreLoss:
    """Energy score over SHT coefficients (reference: loss.py:577).

    ``sht`` must be a channels-last transform mapping [..., lat, lon, C]
    -> [..., l, m, C] complex.
    """

    def __init__(self, sht: Callable, whitening=None):
        self.sht = sht
        self._whitening = whitening

    def __call__(self, x, y):
        x_hat = self.sht(x)
        y_hat = self.sht(y)
        n_l, n_m = x_hat.shape[-3], x_hat.shape[-2]
        scaling = 2.0 * (n_l * n_m) ** 0.5
        # weight m>0 modes by 2 (Hermitian symmetry)
        mode_weights = jnp.full((n_l, n_m, 1), 2.0).at[:, 0, :].set(1.0)
        es = get_energy_score(x_hat, y_hat) * mode_weights
        if self._whitening is not None:
            es = es * self._whitening.factor(y_hat)
        # sum over modes / scaling, as per-channel (B, C)
        return jnp.sum(es, axis=(-3, -2)) / scaling


class EnsembleLoss:
    """crps_weight * CRPS + energy_score_weight * EnergyScore (+ optional
    finite-difference CRPS), the ACE2 training loss (reference: loss.py:711).
    """

    def __init__(self, crps_weight, energy_score_weight, sht,
                 finite_difference_crps_weight=0.0,
                 finite_difference_crps_levels=1,
                 almost_fair_crps_alpha=1.0,
                 energy_score_whitening=None):
        if crps_weight < 0 or energy_score_weight < 0:
            raise ValueError("weights must be non-negative")
        if crps_weight + energy_score_weight == 0:
            raise ValueError("crps+energy weights must be positive")
        self.crps_loss = CRPSLoss(alpha=almost_fair_crps_alpha)
        self.energy_score_loss = EnergyScoreLoss(
            sht, whitening=energy_score_whitening
        )
        self.diff_crps_loss = (
            FiniteDifferenceCRPSLoss(
                alpha=almost_fair_crps_alpha,
                levels=finite_difference_crps_levels,
            )
            if finite_difference_crps_weight > 0
            else None
        )
        self.crps_weight = crps_weight
        self.energy_score_weight = energy_score_weight
        self.diff_crps_weight = finite_difference_crps_weight

    def __call__(self, x, y):
        total = 0.0
        if self.crps_weight > 0:
            total = total + self.crps_weight * self.crps_loss(x, y)
        if self.energy_score_weight > 0:
            total = total + self.energy_score_weight * self.energy_score_loss(
                x, y
            )
        if self.diff_crps_loss is not None:
            total = total + self.diff_crps_weight * self.diff_crps_loss(x, y)
        return total


class WeightedMappingLoss:
    """Normalize + pack dicts, apply per-variable weights, compute the
    inner loss, return LossOutput (reference: loss.py:186).
    """

    def __init__(self, loss, weights: dict[str, float], out_names: list[str],
                 normalizer: StandardNormalizer, ensemble: bool = False):
        self.loss = loss
        self.out_names = list(out_names)
        self.weights = jnp.asarray(
            [weights.get(k, 1.0) for k in out_names], dtype=jnp.float32
        )
        self.normalizer = normalizer
        self.ensemble = ensemble

    def __call__(self, predict_dict: TensorMapping,
                 target_dict: TensorMapping,
                 data_mask: TensorMapping | None = None) -> LossOutput:
        pred_norm = self.normalizer.normalize(dict(predict_dict))
        targ_norm = self.normalizer.normalize(dict(target_dict))
        pred = jnp.stack([pred_norm[k] for k in self.out_names], axis=-1)
        targ = jnp.stack([targ_norm[k] for k in self.out_names], axis=-1)
        nan_mask = jnp.isnan(targ)
        pred = jnp.where(nan_mask, 0.0, pred)
        targ = jnp.where(nan_mask, 0.0, targ)
        per_bc = self.loss(self.weights * pred, self.weights * targ)  # (B, C)
        if data_mask is None:
            per_channel = jnp.mean(per_bc, axis=0)
            return LossOutput(
                total=jnp.mean(per_channel),
                per_channel={
                    k: per_channel[i] for i, k in enumerate(self.out_names)
                },
            )
        # per-variable [batch] presence masks: masked samples are
        # excluded from the per-channel average and fully-masked
        # channels from the total (reference loss.py:284-301 + the
        # LossOutput masked reduction)
        mask = jnp.stack(
            [
                jnp.asarray(
                    data_mask[k], jnp.float32
                ) if k in data_mask else jnp.ones(
                    per_bc.shape[0], jnp.float32
                )
                for k in self.out_names
            ],
            axis=-1,
        )  # (B, C)
        counts = jnp.sum(mask, axis=0)
        per_channel = jnp.sum(per_bc * mask, axis=0) / jnp.maximum(
            counts, 1.0
        )
        active = (counts > 0).astype(jnp.float32)
        total = jnp.sum(per_channel * active) / jnp.maximum(
            jnp.sum(active), 1.0
        )
        return LossOutput(
            total=total,
            per_channel={
                k: per_channel[i] for i, k in enumerate(self.out_names)
            },
        )


class WeightedSum:
    def __init__(self, losses: list, weights: list[float]):
        if len(losses) != len(weights):
            raise ValueError("losses and weights must have the same length")
        self.losses = losses
        self.weights = weights

    def __call__(self, x, y):
        total = 0.0
        for w, loss in zip(self.weights, self.losses):
            total = total + w * loss(x, y)
        return total


class StepLoss:
    """Per-rollout-step loss with optional sqrt step decay
    (reference: loss.py:875).
    """

    def __init__(self, loss: WeightedMappingLoss,
                 sqrt_loss_decay_constant: float = 0.0):
        self.loss = loss
        self.sqrt_loss_decay_constant = sqrt_loss_decay_constant

    def __call__(self, predict_dict, target_dict, step,
                 data_mask=None) -> LossOutput:
        step_weight = (1.0 + self.sqrt_loss_decay_constant * step) ** (-0.5)
        return self.loss(
            predict_dict, target_dict, data_mask=data_mask
        ).scale(step_weight)


@dataclasses.dataclass
class LossConfig:
    """Loss builder config (reference: loss.py:776)."""

    type: Literal[
        "LpLoss", "L1", "MSE", "AreaWeightedMSE", "NaN", "EnsembleLoss"
    ] = "MSE"
    kwargs: Mapping[str, Any] = dataclasses.field(default_factory=dict)
    global_mean_type: Literal["LpLoss"] | None = None
    global_mean_kwargs: Mapping[str, Any] = dataclasses.field(
        default_factory=dict
    )
    global_mean_weight: float = 1.0

    def build(self, gridded_operations, sht: Callable | None = None):
        if self.type == "LpLoss":
            main_loss: Any = LpLoss(**self.kwargs)
        elif self.type == "L1":
            main_loss = L1Loss()
        elif self.type == "MSE":
            main_loss = MSELoss()
        elif self.type == "AreaWeightedMSE":
            main_loss = AreaWeightedMSELoss(
                gridded_operations.area_weighted_mean_channels_last
            )
        elif self.type == "EnsembleLoss":
            if sht is None:
                raise ValueError("EnsembleLoss requires an SHT transform")
            kwargs = dict(self.kwargs)
            # reference defaults (loss.py: crps_weight 1.0, energy 0.0)
            kwargs.setdefault("crps_weight", 1.0)
            kwargs.setdefault("energy_score_weight", 0.0)
            whitening_cfg = kwargs.pop("energy_score_whitening", None)
            whitening = None
            if isinstance(whitening_cfg, dict):
                from ace_tpu.core.config import from_dict as _fd

                whitening = _fd(
                    SpectralWhiteningConfig, whitening_cfg
                ).build()
            elif isinstance(whitening_cfg, SpectralWhiteningConfig):
                whitening = whitening_cfg.build()
            main_loss = EnsembleLoss(
                sht=sht, energy_score_whitening=whitening, **kwargs
            )
        elif self.type == "NaN":
            def main_loss(x, y):
                return jnp.full(
                    (x.shape[0], x.shape[-1]), jnp.nan, dtype=jnp.float32
                )
        else:
            raise NotImplementedError(self.type)

        if self.global_mean_type is not None:
            gm = GlobalMeanLoss(
                gridded_operations.area_weighted_mean_channels_last,
                LpLoss(**self.global_mean_kwargs),
            )
            return WeightedSum([main_loss, gm], [1.0, self.global_mean_weight])
        return main_loss


@dataclasses.dataclass
class StepLossConfig:
    """StepLoss builder config with per-variable weights
    (reference: loss.py:913).
    """

    type: Literal["LpLoss", "MSE", "AreaWeightedMSE", "EnsembleLoss"] = "MSE"
    kwargs: Mapping[str, Any] = dataclasses.field(default_factory=dict)
    global_mean_type: Literal["LpLoss"] | None = None
    global_mean_kwargs: Mapping[str, Any] = dataclasses.field(
        default_factory=dict
    )
    global_mean_weight: float = 1.0
    sqrt_loss_step_decay_constant: float = 0.0
    weights: dict[str, float] = dataclasses.field(default_factory=dict)

    @property
    def is_ensemble_loss(self) -> bool:
        return self.type == "EnsembleLoss"

    def build(self, gridded_ops, out_names: list[str],
              normalizer: StandardNormalizer,
              sht: Callable | None = None) -> StepLoss:
        loss_config = LossConfig(
            type=self.type,
            kwargs=self.kwargs,
            global_mean_type=self.global_mean_type,
            global_mean_kwargs=self.global_mean_kwargs,
            global_mean_weight=self.global_mean_weight,
        )
        inner = loss_config.build(gridded_ops, sht=sht)
        return StepLoss(
            WeightedMappingLoss(
                loss=inner,
                weights=dict(self.weights),
                out_names=out_names,
                normalizer=normalizer,
                ensemble=self.is_ensemble_loss,
            ),
            sqrt_loss_decay_constant=self.sqrt_loss_step_decay_constant,
        )
