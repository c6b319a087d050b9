"""Worker for the real multi-process metric-gather test.

Launched twice by tests/test_multiprocess_gather.py with
argv = [coordinator_port, process_id]. Forces the CPU platform BEFORE
jax.distributed.initialize so the tunneled TPU plugin (which only one
process may hold) stays untouched, then drives the exact production
path: encode_strings -> all_gather_metrics (the process_count()>1
branch of far_tpu/parallel/comm.py) -> decode_strings -> identifier
dedup as cli/evaluate.py does.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    port, pid = int(sys.argv[1]), int(sys.argv[2])
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()

    import numpy as np

    from far_tpu.eval.metrics import aggregate_metrics
    from far_tpu.parallel.comm import (
        all_gather_metrics,
        decode_strings,
        encode_strings,
    )

    # rank-local shards; pair0 is DUPLICATED across ranks (the padded
    # sampler repeats tail pairs) and must be deduped downstream
    names = [f"scene0#pair{pid * 2 + i}" for i in range(3)]
    names[0] = "scene0#pair0"
    r_errs = np.asarray([pid * 2 + i for i in range(3)], np.float32)

    gathered = all_gather_metrics({
        "identifiers": encode_strings(names),
        "R_errs": r_errs,
        "t_errs": r_errs * 0.5,
        "t_errs_abs": r_errs * 0.1,
        "successful_fits": np.ones(3, np.float32),
        "epi_errs": np.full((3, 4), 1e-5, np.float32),
    })
    idents = decode_strings(np.asarray(gathered["identifiers"]))

    # both ranks must see the concatenation in process order
    assert len(idents) == 6, idents
    assert idents[0] == "scene0#pair0" and idents[3] == "scene0#pair0"
    assert list(np.asarray(gathered["R_errs"])) == [0, 1, 2, 2, 3, 4], \
        gathered["R_errs"]

    # identifier dedup (cli/evaluate flow -> eval/metrics.py)
    table = aggregate_metrics({
        "identifiers": idents,
        "R_errs": list(np.asarray(gathered["R_errs"])),
        "t_errs": list(np.asarray(gathered["t_errs"])),
        "t_errs_abs": list(np.asarray(gathered["t_errs_abs"])),
        "successful_fits": list(np.asarray(gathered["successful_fits"])),
        "epi_errs": [e for e in np.asarray(gathered["epi_errs"])],
    })
    assert table["dset size"] == 5, table   # 6 gathered - 1 duplicate
    print(f"MP_GATHER_OK rank={pid} n={table['dset size']}")


if __name__ == "__main__":
    main()
