"""Effective-CPU probe: measured sustained parallelism sizes the knobs."""

from __future__ import annotations


def test_effective_cpu_probe_bounds(ray_session):
    from lightrag_ray.probe import measure_effective_cpus

    eff = measure_effective_cpus(4, task_secs=0.2, rounds=1)
    assert 1.0 <= eff <= 4.0


def test_probed_config_sizes_from_measurement(ray_session):
    from lightrag_ray.config import PipelineConfig

    cfg = PipelineConfig.probed(4)
    eff = getattr(cfg, "_effective_cpus", None)
    assert eff is not None and 1.0 <= eff <= 4.0
    sized = max(2, min(4, round(eff)))
    assert cfg.shuffle_partitions == max(8, sized)
    assert cfg.reduce_buckets == max(64, 4 * sized)
    # a host sustaining < 70 % of nominal must not run concurrent reduces
    if eff < 0.7 * 4:
        assert cfg.concurrent_reduces is False
    # overrides still win
    cfg2 = PipelineConfig.probed(4, salt_buckets=11)
    assert cfg2.salt_buckets == 11
