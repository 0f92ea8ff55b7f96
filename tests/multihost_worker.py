"""Worker for the jax.distributed localhost-coordinator test.

Usage: python multihost_worker.py <coordinator> <num_processes> <pid> \
    [result_file]

Each process joins the cluster, then performs a cross-process
allgather so the test exercises a real collective over the
coordinator-established grpc channels (not just the handshake).

The result is written to ``result_file`` (when given) rather than
stdout: gloo writes its connection banners straight to fd 1 and can
interleave mid-line with Python's buffered stdout, which made
stdout-matching flaky.
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

from medaka_tpu import parallel  # noqa: E402


def main():
    coord, n, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    parallel.initialize_distributed(coord, n, pid)
    assert jax.process_count() == n, jax.process_count()
    assert len(jax.devices()) == n * len(jax.local_devices())

    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(jnp.array([pid]))
    vals = sorted(int(v) for v in gathered.ravel())
    assert vals == list(range(n)), vals
    msg = "DIST_OK {} {}".format(pid, vals)
    if len(sys.argv) > 4:
        with open(sys.argv[4], "w") as fh:
            fh.write(msg + "\n")
    print(msg)


if __name__ == "__main__":
    main()
