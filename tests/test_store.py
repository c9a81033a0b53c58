"""Condition-store parity: StoredFEADataset must reproduce FEADataset
(the reference's FEADataset contract, model/diffusion.py:41-380)
bit-exactly from the decoded-on-disk store."""

import numpy as np
import pytest

from fea_tpu.data import FEADataset
from fea_tpu.data.store import StoredFEADataset, build_condition_store
from fea_tpu.datagen import generate_data


@pytest.fixture(scope="module")
def store_dataset(tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("sdata"))
    generate_data(
        data_dir=data_dir,
        image_size=96,
        num_plates=2,
        conditions_per_plate=2,
        mesh_size=0.08,
        num_steps_per_condition=4,
        seed=11,
        verbose=False,
    )
    store_dir = str(tmp_path_factory.mktemp("sstore"))
    build_condition_store(
        data_dir,
        store_dir,
        num_plates=2,
        image_size=64,
        conditions_per_plate=2,
        num_steps=4,
    )
    return data_dir, store_dir


def test_store_bit_exact_parity(store_dataset):
    data_dir, store_dir = store_dataset
    png = FEADataset(
        data_dir, image_size=64, conditions_per_plate=2, num_steps=4
    )
    stored = StoredFEADataset(store_dir)
    assert len(stored) == len(png) == 2 * 2 * 3
    for i in range(len(png)):
        a, b = png[i], stored[i]
        assert set(a.keys()) == set(b.keys())
        for k in a:
            av, bv = np.asarray(a[k]), np.asarray(b[k])
            assert av.dtype == bv.dtype, (k, av.dtype, bv.dtype)
            assert av.shape == bv.shape, (k, av.shape, bv.shape)
            assert np.array_equal(av, bv), (
                i,
                k,
                float(np.abs(av.astype(np.float64) - bv).max()),
            )


def test_store_resume_is_idempotent(store_dataset):
    data_dir, store_dir = store_dataset
    # re-running the builder over a complete store is a no-op
    build_condition_store(
        data_dir, store_dir, num_plates=2, image_size=64,
        conditions_per_plate=2, num_steps=4,
    )
    stored = StoredFEADataset(store_dir)
    png = FEADataset(data_dir, image_size=64, conditions_per_plate=2, num_steps=4)
    s, p = stored[3], png[3]
    assert np.array_equal(s["forces"], p["forces"])


def test_store_crash_consistency(store_dataset, tmp_path):
    """A builder killed before flush() must leave done=0 on disk for
    everything built since the last flush — done=1 may only ever imply
    'scalars + pixels durable' (a memmap done flag written eagerly can
    hit disk before the in-RAM scalar table does, silently poisoning a
    resumed build with zero forces/materials/ranges)."""
    from fea_tpu.data.store import ConditionStoreBuilder

    data_dir, _ = store_dataset
    store_dir = str(tmp_path / "crash_store")
    b = ConditionStoreBuilder(
        data_dir, store_dir, num_plates=2, image_size=64,
        conditions_per_plate=2, num_steps=4,
    )
    b.build_plate(1)
    # no flush: simulate a crash — a NEW builder must see plate 1 pending
    b2 = ConditionStoreBuilder(
        data_dir, store_dir, num_plates=2, image_size=64,
        conditions_per_plate=2, num_steps=4,
    )
    assert b2.pending_plates() == [1, 2]
    # but the in-flight builder itself knows what it already built
    assert b.pending_plates() == [2]
    # flush commits: done flags + scalars land together
    b.flush()
    b3 = ConditionStoreBuilder(
        data_dir, store_dir, num_plates=2, image_size=64,
        conditions_per_plate=2, num_steps=4,
    )
    assert b3.pending_plates() == [2]
    assert float(np.abs(b3.ranges[:2]).sum()) > 0.0  # scalars made it too


def test_store_rejects_min_max_modes(store_dataset):
    _, store_dir = store_dataset
    with pytest.raises(AssertionError):
        StoredFEADataset(store_dir, min_max_magnitude=(1, 1000))


def test_trainer_with_store_and_bf16(store_dataset, tmp_path):
    """Trainer feeds from the condition store (config.dataset_store), and
    the bf16 mixed-precision path (compute_dtype='bfloat16': bf16 MXU
    compute, f32 master weights) produces a loss close to the f32 one
    from the same init."""
    data_dir, store_dir = store_dataset
    from fea_tpu.train import Trainer, TrainerConfig

    losses = {}
    for dtype in (None, "bfloat16"):
        cfg = TrainerConfig(
            dataset_folder=data_dir,
            sample_dataset_folder=data_dir,
            dataset_store=store_dir,
            dataset_image_size=64,
            train_batch_size=8,  # divides the 8-device test mesh
            num_gradient_accumulation_steps=2,
            num_train_steps=1,
            num_steps_per_condition=4,
            num_steps_per_sample_condition=4,
            conditions_per_plate=2,
            num_sample_conditions_per_plate=2,
            results_folder=str(tmp_path / f"r{dtype}"),
            skip_dataset_size_check=True,
            input_dim=16,
            progress_bar=False,
            compute_dtype=dtype,
            seed=7,
        )
        t = Trainer(cfg)
        assert isinstance(t.dataset, StoredFEADataset)
        batch = t._fetch_batch(0)
        state, loss = t._train_step(t.state, batch)
        assert int(state.step) == 1
        losses[dtype] = float(loss)
    assert np.isfinite(losses[None]) and np.isfinite(losses["bfloat16"])
    assert abs(losses[None] - losses["bfloat16"]) < 0.05 * max(
        1.0, abs(losses[None])
    ), losses


@pytest.mark.parametrize("dtype", [None, "bfloat16"])
def test_device_resident_store_bit_exact(store_dataset, tmp_path, dtype):
    """The HBM-resident table path (device_resident_store: batches
    assembled inside the jitted step from index vectors,
    data/device_store.py) must produce exactly the host feed's loss and
    params from the same initial state."""
    data_dir, store_dir = store_dataset
    from fea_tpu.train import Trainer, TrainerConfig

    def make(device_resident, tag):
        cfg = TrainerConfig(
            dataset_folder=data_dir,
            sample_dataset_folder=data_dir,
            dataset_store=store_dir,
            dataset_image_size=64,
            train_batch_size=8,
            num_gradient_accumulation_steps=2,
            num_train_steps=1,
            num_steps_per_condition=4,
            num_steps_per_sample_condition=4,
            conditions_per_plate=2,
            num_sample_conditions_per_plate=2,
            results_folder=str(tmp_path / f"dr_{tag}"),
            skip_dataset_size_check=True,
            input_dim=16,
            progress_bar=False,
            compute_dtype=dtype,
            device_resident_store=device_resident,
            seed=7,
        )
        return Trainer(cfg)

    t_dev, t_host = make(True, f"d{dtype}"), make(False, f"h{dtype}")
    assert t_dev.device_tables is not None
    assert t_host.device_tables is None
    b_dev, b_host = t_dev._fetch_batch(0), t_host._fetch_batch(0)
    assert "ci" in b_dev and "ci" not in b_host
    # per-step host traffic in index mode is just the index vectors
    assert sum(np.asarray(v).nbytes for v in b_dev.values()) < 1024
    s1, l1 = t_dev._train_step(t_dev.state, b_dev, t_dev.device_tables)
    s2, l2 = t_host._train_step(t_host.state, b_host)
    assert float(l1) == float(l2), (float(l1), float(l2))
    import jax

    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_table_mask_bitpacking(store_dataset):
    """Bitpacked {0,1} masks (8 px/byte in HBM, commit b4f9d09) must
    assemble bit-exactly the same batch as flat uint8 tables, and the
    table estimate must account for the 8x mask shrink."""
    import jax.numpy as jnp

    from fea_tpu.data.device_store import (
        _unpack_mask_bits,
        assemble_batch,
        build_device_tables,
        estimate_table_bytes,
    )

    _, store_dir = store_dataset
    ds = StoredFEADataset(store_dir)
    assert ds.image_size % 8 == 0
    tables = build_device_tables(ds)
    # masks ride packed: 8x smaller than the flat uint8 arrays
    assert "geometry_bits" in tables and "geometry" not in tables
    assert tables["geometry_bits"].nbytes * 8 == ds.geometry.nbytes
    assert tables["constraints_bits"].nbytes * 8 == ds.constraints.nbytes
    est = estimate_table_bytes(ds)
    assert est >= sum(int(v.nbytes) for v in tables.values())

    # unpack round-trips the exact masks
    np.testing.assert_array_equal(
        np.asarray(_unpack_mask_bits(tables["geometry_bits"])),
        np.asarray(ds.geometry),
    )

    # packed and flat tables assemble identical batches
    flat = dict(tables)
    del flat["geometry_bits"], flat["constraints_bits"]
    flat["geometry"] = jnp.asarray(np.asarray(ds.geometry))
    flat["constraints"] = jnp.asarray(np.asarray(ds.constraints))
    from fea_tpu.data.device_store import index_arrays

    idx = {
        k: jnp.asarray(v)
        for k, v in index_arrays(ds, np.arange(len(ds))[:5]).items()
    }
    a = assemble_batch(tables, idx)
    b = assemble_batch(flat, idx)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), k)
