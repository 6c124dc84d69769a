"""Filter tests (reference: tests/cpp/test_filter.cpp:31-201)."""

import numpy as np
import pytest

import pcr_tpu as pcr
from pcr_tpu.engine.filter import evaluate_filter_mask


def make_cloud():
    c = pcr.PointCloud.create(6)
    c.set_x_array(np.zeros(6))
    c.set_y_array(np.zeros(6))
    c.add_channel("v", pcr.DataType.Float32)
    c.set_channel_array_f32("v", np.array([0, 1, 2, 3, 4, 5], np.float32))
    c.add_channel("cls", pcr.DataType.Float32)
    c.set_channel_array_f32("cls", np.array([1, 2, 2, 3, 1, 9], np.float32))
    return c


CO = pcr.CompareOp


@pytest.mark.parametrize("op,value,expected", [
    (CO.Equal, 2.0, [False, False, True, False, False, False]),
    (CO.NotEqual, 2.0, [True, True, False, True, True, True]),
    (CO.Less, 2.0, [True, True, False, False, False, False]),
    (CO.LessEqual, 2.0, [True, True, True, False, False, False]),
    (CO.Greater, 2.0, [False, False, False, True, True, True]),
    (CO.GreaterEqual, 2.0, [False, False, True, True, True, True]),
])
def test_compare_ops(op, value, expected):
    cloud = make_cloud()
    spec = pcr.FilterSpec().add("v", op, value)
    assert evaluate_filter_mask(cloud, spec).tolist() == expected


def test_in_set():
    cloud = make_cloud()
    spec = pcr.FilterSpec().add_in_set("cls", [2.0, 9.0])
    assert evaluate_filter_mask(cloud, spec).tolist() == \
        [False, True, True, False, False, True]


def test_not_in_set():
    cloud = make_cloud()
    spec = pcr.FilterSpec()
    spec.predicates.append(pcr.FilterPredicate(
        "cls", CO.NotInSet, 0.0, [1.0]))
    assert evaluate_filter_mask(cloud, spec).tolist() == \
        [False, True, True, True, False, True]


def test_and_semantics():
    cloud = make_cloud()
    spec = (pcr.FilterSpec()
            .add("v", CO.Greater, 0.5)
            .add("cls", CO.Equal, 2.0))
    assert evaluate_filter_mask(cloud, spec).tolist() == \
        [False, True, True, False, False, False]


def test_empty_spec_passes_all():
    cloud = make_cloud()
    spec = pcr.FilterSpec()
    assert spec.empty()
    assert evaluate_filter_mask(cloud, spec).all()


def test_invalid_channel_raises():
    cloud = make_cloud()
    spec = pcr.FilterSpec().add("missing", CO.Equal, 1.0)
    with pytest.raises(pcr.PcrError):
        evaluate_filter_mask(cloud, spec)


def test_filter_in_pipeline_drops_points():
    from conftest import make_grid_config
    gc = make_grid_config(w=10.0, h=10.0)
    c = pcr.PointCloud.create(4)
    c.set_x_array(np.array([1.5, 2.5, 3.5, 4.5]))
    c.set_y_array(np.array([9.5, 9.5, 9.5, 9.5]))
    c.add_channel("v", pcr.DataType.Float32)
    c.set_channel_array_f32("v", np.array([1, 2, 3, 4], np.float32))
    cfg = pcr.PipelineConfig()
    cfg.grid = gc
    spec = pcr.ReductionSpec(value_channel="v", type=pcr.ReductionType.Sum)
    cfg.reductions = [spec]
    cfg.filter = pcr.FilterSpec().add("v", CO.GreaterEqual, 3.0)
    cfg.exec_mode = pcr.ExecutionMode.CPU
    p = pcr.Pipeline.create(cfg)
    p.ingest(c)
    p.finalize()
    band = p.result().band_array(0)
    # filtered-out points contribute nothing (Sum identity inside the
    # touched tile is 0.0, matching reference finalize semantics)
    assert band[0, 1] == 0.0 and band[0, 2] == 0.0
    assert band[0, 3] == 3.0 and band[0, 4] == 4.0
    assert p.stats().points_processed == 2
