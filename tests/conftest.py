"""Test harness configuration.

Tests run JAX on a virtual 8-device CPU mesh (no TPU needed; the driver
dry-runs the real-hardware path separately). PCR_FORCE_JAX makes the
pipeline treat the JAX CPU backend as an accelerator so the device code
path is exercised by the parity tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"   # hard override: the driver env pins axon
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("PCR_FORCE_JAX", "1")

# The environment's site config prepends the axon TPU platform to
# jax_platforms regardless of the env var; force CPU before any backend
# initializes so tests never touch the TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import warnings

import numpy as np
import pytest

import pcr_tpu as pcr

warnings.filterwarnings("ignore", message=".*donat.*")


@pytest.fixture
def grid_config():
    """1000x1000 grid @ cell 1.0, tile 256, EPSG:3857 — mirrors the
    reference fixture (tests/cpp/test_helpers.h:27-97)."""
    bbox = pcr.BBox()
    bbox.min_x, bbox.min_y, bbox.max_x, bbox.max_y = 0.0, 0.0, 1000.0, 1000.0
    gc = pcr.GridConfig()
    gc.bounds = bbox
    gc.cell_size_x = 1.0
    gc.cell_size_y = -1.0
    gc.tile_width = 256
    gc.tile_height = 256
    gc.crs = pcr.CRS.from_epsg(3857)
    gc.compute_dimensions()
    return gc


def make_grid_config(w=100.0, h=100.0, cell=1.0, tile=4096, epsg=3857):
    bbox = pcr.BBox()
    bbox.min_x, bbox.min_y, bbox.max_x, bbox.max_y = 0.0, 0.0, w, h
    gc = pcr.GridConfig()
    gc.bounds = bbox
    gc.cell_size_x = cell
    gc.cell_size_y = -cell
    gc.tile_width = tile
    gc.tile_height = tile
    gc.crs = pcr.CRS.from_epsg(epsg)
    gc.compute_dimensions()
    return gc


def make_cloud(n, seed=0, w=100.0, h=100.0, channels=("v",)):
    rng = np.random.default_rng(seed)
    c = pcr.PointCloud.create(n)
    c.set_x_array(rng.uniform(0, w, n))
    c.set_y_array(rng.uniform(0, h, n))
    for name in channels:
        c.add_channel(name, pcr.DataType.Float32)
        c.set_channel_array_f32(name, rng.normal(0, 1, n).astype(np.float32))
    return c


@pytest.fixture
def tmp_state_dir(tmp_path):
    return str(tmp_path / "state")
