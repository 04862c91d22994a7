"""Worker process for the multi-host test (tests/test_multihost.py).

Usage: python multihost_worker.py <coordinator> <nprocs> <pid> <outdir>
           [size] [maxDepth] [local_devices]

Joins the jax.distributed coordination service on the CPU backend with
local_devices (default 2) virtual devices per process, renders the
Cornell box over the GLOBAL mesh (G-PT row-sharded tiles with
cross-process ppermute halo exchange), and writes the gathered buffers
to <outdir>/bufs_<pid>.npz.  The optional size/depth/device args let the
default test gate run a tiny (<2 min on one core) configuration while
the -m slow variant keeps the full 16x16x2-device proof.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator, nprocs, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    size = sys.argv[5] if len(sys.argv) > 5 else "16"
    depth = sys.argv[6] if len(sys.argv) > 6 else "3"
    local_devices = int(sys.argv[7]) if len(sys.argv) > 7 else 2

    os.environ["JAX_PLATFORMS"] = "cpu"
    from gradientdomain_mitsuba_tpu.parallel import multihost
    import jax
    jax.config.update("jax_platforms", "cpu")
    multihost.init(coordinator, nprocs, pid,
                   local_device_count=local_devices)
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == local_devices * nprocs, jax.devices()

    import numpy as np
    from gradientdomain_mitsuba_tpu.models.gpt import GPTracer
    from gradientdomain_mitsuba_tpu.scene import scene as sc

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene, st = sc.load_scene(
        os.path.join(root, "data/scenes/cbox/cbox.xml"),
        {"width": size, "height": size, "spp": "2", "maxDepth": depth,
         "integrator": "gpt"})
    tracer = GPTracer(scene, st)
    bufs = multihost.render_gpt_multihost(tracer, scene, seed=2,
                                          n_samples=2)
    np.savez(os.path.join(outdir, f"bufs_{pid}.npz"), **bufs)
    print(f"worker {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
