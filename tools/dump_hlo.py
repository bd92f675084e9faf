"""AOT-compile fusion.step for the TPU and dump optimized HLO to a file,
so hot op names from tools/trace_step.py (fusion.NNNN, while.NNN,
copy-start.NN) can be matched back to source-level operations.

Run: python tools/dump_hlo.py [out=/tmp/step_hlo.txt]
"""
import sys

sys.path.insert(0, ".")
from vulcan_tpu.utils.runtime import setup_cache

setup_cache()

import jax
import jax.numpy as jnp

from vulcan_tpu.config import Config
from vulcan_tpu.core.camera import PinholeCamera
from vulcan_tpu.pipeline import fusion


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_hlo.txt"
    mode = sys.argv[2] if len(sys.argv) > 2 else "depth"
    h, w = 480, 640
    config = Config()
    camera = PinholeCamera.tum_default()
    state = fusion.init_state(config, camera, h, w)
    d = jnp.zeros((h, w), jnp.uint16)
    c = jnp.zeros((h, w, 3), jnp.uint8)
    lowered = jax.jit(
        fusion.step, static_argnames=("config", "mode"),
        donate_argnames=("state",),
    ).lower(state, d, c, config, mode)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out}")


if __name__ == "__main__":
    main()
