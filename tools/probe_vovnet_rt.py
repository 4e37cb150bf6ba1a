#!/usr/bin/env python
"""A/B the cf row-tile size rt on the FULL vovnet_cf eval forward
(noise-controlled: same process, interleaved reps). Bigger rt = larger
N per matmul and fewer grid steps, but more H padding at deep stages."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from tools.tpu_probe import fetch_overhead, log, loop_time  # noqa: E402

DT = jnp.bfloat16


def main():
    views, h, w = 4, 640, 1600
    rts = [int(r) for r in (sys.argv[1:] or ["8", "16"])]
    log(f"==== probe_vovnet_rt FULL {views}x{h}x{w} rts={rts} ====")
    fetch_overhead()
    from cmtcoop_tpu.models.vovnet import VoVNet
    from cmtcoop_tpu.models.vovnet_cf import vovnet_cf

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(views, h, w, 3))
                    .astype(np.float32)).astype(DT)
    net = VoVNet("V-99-eSE", ("stage4", "stage5"), dtype=DT)
    params = jax.jit(lambda k, x_: net.init(k, x_, False))(
        jax.random.PRNGKey(0), x)

    for rep in range(2):
        for rt in rts:
            def fn(c, pr, x_, rt=rt):
                outs = vovnet_cf(pr, x_ + c.astype(DT) * 0, "V-99-eSE",
                                 ("stage4", "stage5"), dtype=DT, rt=rt)
                return sum(o.astype(jnp.float32).sum() * 1e-20
                           for o in outs.values())
            loop_time(fn, params, x, name=f"  FULL rt={rt} rep{rep}",
                      n=10)


if __name__ == "__main__":
    main()
