"""Distribution utilities: mesh setup + cross-host aggregation."""

from far_tpu.parallel.comm import (
    all_gather_metrics,
    init_distributed,
    local_mesh,
    process_index,
)
