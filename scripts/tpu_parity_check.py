"""Hardware parity check: the compiled Pallas engine vs the independent
anti-diagonal oracle, both running on the attached TPU.

The suite lives in oswald_tpu.utils.parity and also runs as bench.py's
asserting pre-stage (every recorded benchmark number carries a parity
certificate).  This script is the standalone entry for manual runs:
python scripts/tpu_parity_check.py
"""

import json
import sys

from oswald_tpu.utils.parity import run_parity


def main():
    import jax
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    out = run_parity(log=print)
    print(json.dumps(out))
    if out["parity"] != "ok":
        return 1
    print("ALL PARITY CHECKS PASSED on", jax.default_backend())
    return 0


if __name__ == "__main__":
    sys.exit(main())
