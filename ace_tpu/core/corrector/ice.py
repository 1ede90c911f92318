"""Sea-ice budget corrector
(reference: fme/core/corrector/ice.py:19 IceBudgetCorrectionConfig,
IceCorrectorConfig :234).

Reconstructs prognostic sea-ice concentration / ice mass / snow mass from
predicted source/sink/transport budget terms, rebalancing the terms so the
update stays non-negative (and concentrations <= 1), with sign constraints
(source >= 0, sink <= 0) enforced by moving residuals to the transport
term. Unlike the reference, rebalancing is applied unconditionally as a
masked elementwise op — zero corrections where no violation exists — so
the whole corrector stays one traced XLA program.
"""

import dataclasses

import jax.numpy as jnp

from ace_tpu.core.corrector.atmosphere import CorrectorOutput, CorrectorState
from ace_tpu.core.typing_ import TensorDict, TensorMapping

_SIC_VARS = ("siconc", "sea_ice_fraction", "ocean_sea_ice_fraction")


@dataclasses.dataclass
class IceBudgetCorrectionConfig:
    """corrected_variables orders budget terms as
    {'variable': ['source_term', 'sink_term', 'transport_term']}
    (reference: ice.py:19).
    """

    corrected_variables: dict[str, list[str]] | None = None

    def constrain_budgets(self, old_mass, source, sink, transport,
                          timestep: float, area_mode: bool = False,
                          ice_mask=None):
        """(reference: ice.py:31 constrain_budgets)."""
        s = source * timestep
        k = sink * timestep
        t = transport * timestep

        def rebalance(s, k, t, mask, mass, sign=1.0):
            nz_s = jnp.abs(s) > 0
            nz_k = jnp.abs(k) > 0
            nz_t = jnp.abs(t) > 0
            n_active = (
                nz_s.astype(s.dtype) + nz_k.astype(s.dtype)
                + nz_t.astype(s.dtype)
            )
            share = jnp.where(
                mask & (n_active > 0),
                mass / jnp.maximum(n_active, 1.0),
                0.0,
            )
            resid_s = jnp.where(mask & nz_s, share, 0.0)
            resid_k = jnp.where(mask & nz_k, share, 0.0)
            resid_t = jnp.where(mask & nz_t, share, 0.0)
            all_zero = mask & (n_active == 0)
            resid_t = jnp.where(all_zero, mass, resid_t)

            # sink must stay <= 0; any overshoot moves to transport.
            # Gated on the violation mask: the reference skips _rebalance
            # entirely when nothing violates, so violation-free cells must
            # pass through byte-identical (reference: ice.py:110 torch.any
            # guard)
            tmp = k + sign * resid_k
            k_overshoot = jnp.where(mask & (tmp > 0), tmp, 0.0)
            resid_k = resid_k - k_overshoot
            resid_t = resid_t + k_overshoot
            # source must stay >= 0
            tmp = s + sign * resid_s
            s_overshoot = jnp.where(mask & (tmp < 0), tmp, 0.0)
            resid_s = resid_s - sign * s_overshoot
            resid_t = resid_t + sign * s_overshoot

            return (
                s + sign * resid_s,
                k + sign * resid_k,
                t + sign * resid_t,
            )

        new_mass = old_mass + (s + k + t)
        neg_mask = new_mass < 0
        deficit = jnp.where(neg_mask, -new_mass, 0.0)
        s, k, t = rebalance(s, k, t, neg_mask, deficit, sign=1.0)

        if area_mode:
            new_mass = old_mass + (s + k + t)
            high_mask = new_mass > 1
            excess = jnp.where(high_mask, new_mass - 1.0, 0.0)
            s, k, t = rebalance(s, k, t, high_mask, excess, sign=-1.0)

        if ice_mask is not None:
            new_mass = old_mass + (s + k + t)
            high_mask = (ice_mask == 0) & (new_mass > 0)
            excess = jnp.where(high_mask, new_mass, 0.0)
            s, k, t = rebalance(s, k, t, high_mask, excess, sign=-1.0)

        # final exact projection: the reference runs this math in float64;
        # in float32 the large dt-scaled terms leave O(eps * |term|)
        # rounding residue on the bounds, which we fold into the transport
        # term so the reconstructed state is exactly within limits
        new_mass = old_mass + (s + k + t)
        target = jnp.maximum(new_mass, 0.0)
        if area_mode:
            target = jnp.minimum(target, 1.0)
        if ice_mask is not None:
            target = jnp.where(ice_mask == 0, 0.0, target)
        t = t + (target - new_mass)

        return s / timestep, k / timestep, t / timestep

    def __call__(self, gen_data: TensorMapping, input_data: TensorMapping,
                 timestep: float) -> TensorDict:
        """(reference: ice.py:136): returns only the modified fields."""
        if self.corrected_variables is None:
            return {}
        work = {k: jnp.asarray(v, jnp.float32)
                for k, v in gen_data.items()}
        x_in = {k: jnp.asarray(v, jnp.float32)
                for k, v in input_data.items()}
        modified: TensorDict = {}

        mask_var = None
        if "simass" in self.corrected_variables:
            mask_var = "simass"
        else:
            sic_in = [v for v in _SIC_VARS
                      if v in self.corrected_variables]
            if sic_in:
                mask_var = sic_in[0]

        order = []
        if "simass" in self.corrected_variables:
            order.append("simass")
        for var in _SIC_VARS:
            if var in self.corrected_variables:
                order.append(var)
        if "sisnmass" in self.corrected_variables:
            order.append("sisnmass")

        for key in order:
            area_mode = key in _SIC_VARS
            ice_mask = None
            if key != order[0] and mask_var is not None:
                ice_mask = work[mask_var]
            terms = self.corrected_variables[key]
            s, k, t = self.constrain_budgets(
                x_in[key], work[terms[0]], work[terms[1]],
                work[terms[2]], timestep=timestep,
                area_mode=area_mode, ice_mask=ice_mask,
            )
            # reconstruct, then fold the float32 rounding residue of the
            # rate-division round-trip into the transport term so the
            # state lands exactly within bounds (the reference computes
            # this in float64)
            raw = x_in[key] + timestep * (s + k + t)
            target = jnp.maximum(raw, 0.0)
            if area_mode:
                target = jnp.minimum(target, 1.0)
            if ice_mask is not None:
                target = jnp.where(ice_mask == 0, 0.0, target)
            t = t + (target - raw) / timestep
            work[terms[0]], work[terms[1]], work[terms[2]] = s, k, t
            work[key] = target
            for name in (*terms, key):
                modified[name] = work[name]
        return modified


@dataclasses.dataclass
class IceCorrectorConfig:
    """(reference: ice.py:234 IceCorrectorConfig)."""

    budget_correction: IceBudgetCorrectionConfig | None = None
    # see AtmosphereCorrectorConfig.corrector_disabled_epochs
    corrector_disabled_epochs: int = 0

    def __post_init__(self):
        if self.corrector_disabled_epochs < 0:
            raise ValueError(
                "corrector_disabled_epochs must be non-negative, got "
                f"{self.corrector_disabled_epochs}"
            )

    @property
    def is_noop(self) -> bool:
        return self.budget_correction is None

    def build(self, gridded_operations, vertical_coordinate,
              timestep) -> "IceCorrector":
        return IceCorrector(self, timestep.total_seconds())


class IceCorrector:
    def __init__(self, config: IceCorrectorConfig,
                 timestep_seconds: float):
        self.config = config
        self._dt = timestep_seconds

    def init_state(self, input_data: TensorMapping) -> CorrectorState:
        return {}

    def __call__(self, input_data, gen_data, forcing_data,
                 corrector_state) -> CorrectorOutput:
        import jax

        gen = dict(gen_data)
        delta: TensorDict = {}
        if self.config.budget_correction is not None:
            changed = self.config.budget_correction(
                gen, input_data, self._dt
            )
            for name, value in changed.items():
                delta[name] = jax.lax.stop_gradient(value - gen[name])
                gen[name] = value
        return CorrectorOutput(
            corrected=gen, corrector_state=dict(corrector_state or {}),
            delta=delta,
        )
