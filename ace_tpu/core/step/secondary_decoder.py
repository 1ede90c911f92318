"""Secondary decoder: extra diagnostics decoded from the main module's
outputs (reference: fme/core/step/secondary_decoder.py:17,45).

The decoder sees the main module's packed (normalized) output channels
through a ``stop_gradient``, so its loss trains only the decoder and never
perturbs the primary model — the JAX analogue of the reference's
``.detach()`` on the output tensor.
"""

import dataclasses

import jax

from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.core.packer import Packer
from ace_tpu.core.typing_ import TensorDict
from ace_tpu.models.registry import ModuleSelector


@dataclasses.dataclass
class SecondaryDecoderConfig:
    """(reference: secondary_decoder.py:17 SecondaryDecoderConfig).

    secondary_diagnostic_names: variables diagnosed column-locally from
    the main module's outputs (no access to latents).
    network: decoder architecture selector.
    """

    secondary_diagnostic_names: list[str]
    network: ModuleSelector

    def build(
        self, n_in_channels: int, dataset_info: DatasetInfo
    ) -> "SecondaryDecoder":
        return SecondaryDecoder(
            in_dim=n_in_channels,
            out_names=self.secondary_diagnostic_names,
            network=self.network,
            dataset_info=dataset_info,
        )


class SecondaryDecoder:
    """(reference: secondary_decoder.py:45). Pure function of
    (params, packed main output): decode -> unpack to named diagnostics.
    """

    def __init__(self, in_dim: int, out_names: list[str],
                 network: ModuleSelector, dataset_info: DatasetInfo):
        self.module = network.build(
            n_in_channels=in_dim,
            n_out_channels=len(out_names),
            dataset_info=dataset_info,
        )
        self._packer = Packer(out_names)
        self._in_dim = in_dim

    def init_params(self, rng: jax.Array, spatial_shape: tuple[int, int]):
        import jax.numpy as jnp

        dummy = jnp.zeros((1, *spatial_shape, self._in_dim))
        return self.module.init(rng, dummy)

    def __call__(self, params, main_output_packed, *, deterministic,
                 rngs) -> TensorDict:
        decoded = self.module.apply(
            params,
            jax.lax.stop_gradient(main_output_packed),
            deterministic=deterministic,
            rngs=rngs,
        )
        return self._packer.unpack(decoded)
