"""Bundle a mixture-of-denoising-experts predictor into one checkpoint.

Reference: scripts/downscaling/bundle_denoising_moe_checkpoint.py —
reads a YAML describing a DenoisingMoEConfig (expert checkpoints, sigma
ranges, sampler parameters), builds the DenoisingMoEPredictor, and
saves it as one self-contained file loadable via
DenoisingMoEBundledConfig(mixture_of_experts_path=...) with no need to
retain the per-expert checkpoint paths.

CLI:
    python -m ace_tpu.data_process.bundle_denoising_moe \
        moe_config.yaml output.msgpack
"""

import argparse
import logging

from ace_tpu.core.config import from_dict

logger = logging.getLogger(__name__)


def bundle_denoising_moe(config_path: str, output_path: str) -> str:
    import yaml

    from ace_tpu.downscaling.models import DenoisingMoEConfig

    with open(config_path) as f:
        raw = yaml.safe_load(f)
    predictor = from_dict(DenoisingMoEConfig, raw).build()
    predictor.save(output_path)
    logger.info("wrote bundled MoE predictor to %s", output_path)
    return output_path


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Bundle denoising-MoE experts into one checkpoint."
    )
    parser.add_argument("config_path")
    parser.add_argument("output_path")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    bundle_denoising_moe(args.config_path, args.output_path)


if __name__ == "__main__":
    main()
