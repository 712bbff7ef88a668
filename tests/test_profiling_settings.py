"""Profiling + settings surface tests."""

import pyarrow as pa


def test_time_recorder_gated_by_setting(monkeypatch):
    from docling_ray.state import profiling
    from docling_ray.state.settings import settings

    timings = {}
    monkeypatch.setattr(settings, "profile_pipeline_timings", False)
    with profiling.TimeRecorder(timings, "stage_a"):
        pass
    assert timings == {}  # disabled: no-op (upstream gate)
    monkeypatch.setattr(settings, "profile_pipeline_timings", True)
    for _ in range(3):
        with profiling.TimeRecorder(timings, "stage_a"):
            pass
    item = timings["stage_a"]
    assert item.count == 3 and len(item.times) == 3
    assert item.avg() >= 0 and item.std() >= 0
    assert item.percentile(50) >= 0


def test_timed_batch_stage_and_rollup(ray_session):
    import ray.data

    from docling_ray.state.profiling import stage_timing_stats, timed_batch_stage

    def work(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "y", pa.array([v.as_py() * 2 for v in batch["x"]], pa.int64()))

    ds = ray.data.from_arrow(pa.table({"x": list(range(100))}))
    ds = ds.map_batches(timed_batch_stage(work, "double"),
                        batch_format="pyarrow")
    stats = stage_timing_stats(ds, ["double"])
    assert stats["double_mean"] >= 0.0
    # single-block runs make max == mean up to aggregation rounding
    assert stats["double_max"] >= stats["double_mean"] * (1 - 1e-9)


def test_settings_env_overrides(monkeypatch):
    monkeypatch.setenv("DOCLING_RAY_BATCH_SIZE", "77")
    monkeypatch.setenv("DOCLING_RAY_PROFILE_PIPELINE_TIMINGS", "true")
    from docling_ray.state.settings import Settings

    s = Settings()
    assert s.batch_size == 77
    assert s.profile_pipeline_timings is True
