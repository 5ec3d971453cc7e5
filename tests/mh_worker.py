"""Worker process for the 2-process jax.distributed localhost test
(tests/test_multihost.py). Each process owns 4 virtual CPU devices; the
global mesh spans 8. Host 0 writes the RAW lines it emits to out_path.

Runs the REAL multi-host code paths the single-process suite cannot:
distributed.initialize, the occupied-prefix gone-table allgather
(stream._fetch_gone), the packed-row allgather (stream._fetch_rows),
and host-0-only emission (stream.run_array)."""

import os
import sys


def main():
    coord, pid, nprocs, cap_path, out_path = sys.argv[1:6]
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4 "
        + os.environ.get("XLA_FLAGS", ""))
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from iridium_tpu.config import DetectorConfig
    from iridium_tpu.output.raw import RawPrinter
    from iridium_tpu.parallel import distributed
    from iridium_tpu.parallel.stream import ShardedPipeline

    distributed.initialize(coordinator_address=coord,
                           num_processes=int(nprocs),
                           process_id=int(pid))
    import jax
    assert jax.process_count() == int(nprocs), jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()

    cfg = DetectorConfig(
        sample_rate=2_000_000, fft_size=512, history_size=8,
        frames_per_block=64, burst_capacity=64, gone_capacity=64,
        max_new_per_frame=32, max_burst_len=18_000, burst_post_len=4_000,
    )
    cap = np.fromfile(cap_path, np.complex64)

    mesh = distributed.make_mesh()
    sp = ShardedPipeline(cfg, mesh=mesh, burst_batch=4,
                         start_time_ns=1_700_000_000_000_000_000)
    printer = RawPrinter("t1")
    lines = [printer.format(f) for f in sp.run_array(cap)]

    if distributed.is_host0():
        with open(out_path, "w") as f:
            f.write("\n".join(sorted(lines)))
            f.write(f"\nSTATS detected={sp.stats.n_detected} "
                    f"ok={sp.stats.n_ok}\n")
    else:
        assert not lines, "non-zero host emitted frames"


if __name__ == "__main__":
    main()
