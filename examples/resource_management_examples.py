"""Resource management demo (reference:
examples/resource_management_examples.py)."""

# allow running straight from a source checkout
import pathlib
import sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


import tempfile
import time

import jax.numpy as jnp

from vivqa_tpu.resources import (BackupConfig, ResourceConfig,
                                 ResourceThresholds,
                                 resource_managed_training)


def main():
    tmp = tempfile.mkdtemp()
    cfg = ResourceConfig(
        thresholds=ResourceThresholds(memory_warning=50.0,
                                      memory_critical=98.0),
        backup=BackupConfig(emergency_dir=f"{tmp}/em",
                            min_interval_seconds=0),
        enable_signal_handlers=False)
    cfg = cfg.replace(intervals=cfg.intervals.replace(memory_seconds=0.2,
                                                      cpu_seconds=0.2))
    with resource_managed_training(cfg) as rm:
        rm.register_model("demo_model", lambda: {"w": jnp.ones((8, 8))})
        rm.start_training(num_epochs=2, steps_per_epoch=5)
        for epoch in range(2):
            rm.start_epoch(epoch)
            for step in range(5):
                time.sleep(0.05)
                rm.update_training_step(epoch, step, loss=1.0 / (step + 1))
            rm.end_epoch(epoch, metric=0.5 + 0.1 * epoch)
        print("status:", rm.get_status_summary()["resources"].keys())
        print("manual backup:", rm.backup.create_backup("demo"))
        report = rm.reports.combined_report()
        print("report sections:", sorted(report.keys()))


if __name__ == "__main__":
    main()
