"""Worker process for the multi-host test (tests/test_multihost.py).

Usage: python multihost_worker.py <coordinator> <nprocs> <pid> <outdir>

Joins the jax.distributed coordination service on the CPU backend with 2
virtual devices per process, renders the Cornell box over the GLOBAL
mesh (G-PT row-sharded tiles with cross-process ppermute halo exchange),
and writes the gathered buffers to <outdir>/bufs_<pid>.npz.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator, nprocs, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    os.environ["JAX_PLATFORMS"] = "cpu"
    from gradientdomain_mitsuba_tpu.parallel import multihost
    import jax
    jax.config.update("jax_platforms", "cpu")
    multihost.init(coordinator, nprocs, pid, local_device_count=2)
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == 2 * nprocs, jax.devices()

    import numpy as np
    from gradientdomain_mitsuba_tpu.models.gpt import GPTracer
    from gradientdomain_mitsuba_tpu.scene import scene as sc

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene, st = sc.load_scene(
        os.path.join(root, "data/scenes/cbox/cbox.xml"),
        {"width": "16", "height": "16", "spp": "2", "maxDepth": "3",
         "integrator": "gpt"})
    tracer = GPTracer(scene, st)
    bufs = multihost.render_gpt_multihost(tracer, scene, seed=2,
                                          n_samples=2)
    np.savez(os.path.join(outdir, f"bufs_{pid}.npz"), **bufs)
    print(f"worker {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
