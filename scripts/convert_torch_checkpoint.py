"""CLI: convert a reference fme torch checkpoint to an ace_tpu checkpoint.

Usage: python scripts/convert_torch_checkpoint.py <in.tar> <out.msgpack>
(reference input layout: fme/ace/stepper/single_module.py:1337)
"""

import sys

from ace_tpu.utils.torch_convert import convert_reference_checkpoint

if __name__ == "__main__":
    convert_reference_checkpoint(sys.argv[1], sys.argv[2])
    print(f"wrote {sys.argv[2]}")
