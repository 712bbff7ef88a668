"""Pipeline composition surface tests."""

import pyarrow as pa

from docling_ray.pipelines.compose import Pipeline, Stage, extraction_pipeline


def test_stage_kinds_and_order(ray_session):
    import ray.data

    def add_one(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "y", pa.compute.add(batch["x"], 1))

    class Doubler:
        def __init__(self, column="y"):
            self.column = column

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "z", pa.compute.multiply(batch[self.column], 2))

    def head3(ds):
        return ds.limit(3)

    pipe = Pipeline([
        Stage(add_one, name="inc"),
        Stage(Doubler, name="double", concurrency=1,
              kwargs={"column": "y"}),
        Stage(head3, name="head", dataset_level=True),
    ])
    ds = ray.data.from_arrow(pa.table({"x": list(range(10))}))
    out = pipe.run(ds).to_pandas()
    assert len(out) == 3
    assert (out["z"] == (out["x"] + 1) * 2).all()


def test_with_stage_is_value_like(ray_session):
    import ray.data

    base = Pipeline([])
    extended = base.with_stage(Stage(lambda b: b.append_column(
        "flag", pa.array([True] * b.num_rows)), name="flag"))
    assert base.stages == [] and len(extended.stages) == 1
    ds = ray.data.from_arrow(pa.table({"x": [1, 2]}))
    assert "flag" in extended.run(ds).to_pandas().columns


def test_extraction_pipeline_value(ray_session):
    import ray.data

    from docling_ray.sources.webpages import make_table

    out = extraction_pipeline().run(
        ray.data.from_arrow(make_table(10, seed=3))).to_pandas()
    assert len(out) == 10 and (out["status"] == "success").all()


def test_vlm_asr_factories():
    import pytest

    from docling_ray.state.factories import asr_factory, vlm_factory

    vf = vlm_factory()
    assert sorted(vf.registered_kind) == ["vlm_api", "vlm_mlx",
                                          "vlm_transformers"]
    with pytest.raises(NotImplementedError):
        vf.create_instance(vf.create_options("vlm_api"))()
    af = asr_factory()
    assert af.registered_kind == ["whisper"]
