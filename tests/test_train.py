import os

import numpy as np
import pytest

from fea_tpu.data import FEADataset
from fea_tpu.data.dataset import EpochSampler
from fea_tpu.datagen import generate_data
from fea_tpu.train import Trainer, TrainerConfig


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("data"))
    generate_data(
        data_dir=data_dir,
        image_size=64,
        num_plates=1,
        conditions_per_plate=2,
        mesh_size=0.08,
        holes_per_polygon_range=(0, 0),
        num_steps_per_condition=3,
        save_meshes=True,
        seed=5,
        verbose=False,
    )
    return data_dir


def test_dataset_contract(tiny_dataset):
    ds = FEADataset(
        tiny_dataset, image_size=64, conditions_per_plate=2, num_steps=3
    )
    assert len(ds) == 1 * 2 * 2  # plates * conditions * (steps-1)
    s = ds[0]
    plate, condition, step = ds.index_to_ids(0)
    assert (plate, condition, step) == (1, 1, 1)

    assert s["geometry"].shape == (64, 64, 1)
    assert set(np.unique(s["geometry"])) <= {-1.0, 1.0}
    assert s["displacement"].shape == (64, 64, 2)
    assert s["displacement"].min() >= -1.0 and s["displacement"].max() <= 1.0
    assert s["constraints"].shape == (64, 64, 1)
    assert s["forces"].shape == (64, 64, 2)
    assert s["materials"].shape == (64, 64, 2)
    assert s["displacement_range"].shape == (4,)
    np.testing.assert_allclose(
        s["log_displacement_range"], np.log1p(np.abs(s["displacement_range"]))
    )

    # step-1 forces are zero: magnitude scaling uses (step-1)/num_steps
    # (reference diffusion.py:256-266)
    assert np.abs(s["forces"]).max() == 0.0
    s2 = ds[1]  # step 2 of condition 1
    assert np.abs(s2["forces"]).max() > 0.0

    # materials: log-E and nu values painted over regions
    mat = s["materials"]
    nonzero = mat[..., 0] != 0
    assert nonzero.any()
    vals = np.unique(np.round(mat[..., 0][nonzero], 5))
    assert (vals > 9).all() and (vals < 14).all()  # ln(E+1), E in 17.5k..411k


def test_epoch_sampler_resume():
    s = EpochSampler(10, seed=3)
    direct = s.indices_at(0, 30)
    # resuming at offset 17 reproduces the same tail
    resumed = s.indices_at(17, 13)
    np.testing.assert_array_equal(direct[17:], resumed)
    # each epoch is a permutation
    assert sorted(direct[:10].tolist()) == list(range(10))
    assert sorted(direct[10:20].tolist()) == list(range(10))


def test_trainer_smoke_and_checkpoint(tiny_dataset, tmp_path):
    results = str(tmp_path / "results")
    config = TrainerConfig(
        dataset_folder=tiny_dataset,
        sample_dataset_folder=tiny_dataset,
        dataset_image_size=32,
        train_batch_size=8,
        num_gradient_accumulation_steps=2,
        num_train_steps=2,
        num_steps_per_milestone=2,
        num_steps_per_soft_milestone=1,
        num_steps_per_condition=3,
        num_steps_per_sample_condition=3,
        conditions_per_plate=2,
        num_sample_conditions_per_plate=2,
        results_folder=results,
        skip_dataset_size_check=True,
        disable_auxiliary=False,
        use_ema=True,
        input_dim=16,
        seed=0,
    )
    trainer = Trainer(config)
    counts = trainer.num_params()
    assert counts["encoder"] > 1e5 and counts["decoder"] > 1e5

    losses = []
    trainer.train(
        wandb_inject_function=lambda step, loss, *a: losses.append(loss)
    )
    assert len(losses) == 2
    assert all(np.isfinite(l) for l in losses)
    assert int(trainer.state.step) == 2

    # milestone checkpoint written (best or latest) + final
    names = os.listdir(results)
    assert any(n.startswith("model-final") for n in names)
    assert any(n in ("model-best", "model-latest") for n in names)
    # sample outputs written under results/<plate>/<condition>/
    assert os.path.isfile(os.path.join(results, "1", "1", "sample_x_1.png"))

    # resume roundtrip
    trainer2 = Trainer(config)
    trainer2.load_checkpoint("final")
    assert int(trainer2.state.step) == 2
    p1 = trainer.state.params["encoder"]
    p2 = trainer2.state.params["encoder"]
    import jax

    leaves1 = jax.tree.leaves(p1)
    leaves2 = jax.tree.leaves(p2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_in_memory_fused_pipeline(tmp_path):
    """Datagen -> training tensors with no filesystem round trip, driving
    one real train step through the Trainer."""
    from fea_tpu.data.arrays import InMemoryFEADataset

    ds = InMemoryFEADataset.generate(
        num_plates=1,
        conditions_per_plate=2,
        num_steps=3,
        image_size=32,
        mesh_size=0.08,
        seed=9,
        holes_per_polygon_range=(0, 0),
    )
    assert len(ds) == 2 * 2  # conditions * (steps-1)
    s = ds[0]
    assert s["geometry"].shape == (32, 32, 1)
    assert s["displacement"].shape == (32, 32, 2)
    assert s["materials"].shape == (32, 32, 2)
    assert np.isfinite(s["displacement_range"]).all()
    # step-1 forces are zero (the (step-1)/num_steps scaling quirk)
    assert np.abs(s["forces"]).max() == 0.0

    config = TrainerConfig(
        dataset_folder="unused",
        sample_dataset_folder="unused",
        dataset_image_size=32,
        train_batch_size=8,
        num_gradient_accumulation_steps=2,
        num_train_steps=1,
        num_steps_per_milestone=100,
        num_steps_per_soft_milestone=100,
        num_steps_per_condition=3,
        num_steps_per_sample_condition=3,
        conditions_per_plate=2,
        results_folder=str(tmp_path),
        skip_dataset_size_check=True,
        input_dim=16,
    )
    trainer = Trainer(config, dataset=ds, sample_dataset=ds)
    losses = []
    trainer.train(wandb_inject_function=lambda s, l, *a: losses.append(l))
    assert len(losses) == 1 and np.isfinite(losses[0])


def test_log_parsing_and_plotting(tmp_path):
    from fea_tpu.utils.logs import parse_train_log, plot_training_curves

    log = tmp_path / "train-test.log"
    log.write_text(
        "2026-01-01 00:00:00 step: 0, loss: 1.5\n"
        "2026-01-01 00:00:01 step: 1, loss: 1.2\n"
        "2026-01-01 00:00:02 sample loss: 1.1\n"
        "2026-01-01 00:00:03 step: 2, loss: 0.9\n"
    )
    data = parse_train_log(str(log))
    assert data["steps"].tolist() == [0, 1, 2]
    assert data["sample_losses"].tolist() == [1.1]
    out = plot_training_curves(str(log))
    assert os.path.isfile(out)


def test_stage_timer():
    from fea_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.summary()


def test_ema_update_math():
    import jax.numpy as jnp

    from fea_tpu.train.ema import ema_update

    ema = {"w": jnp.ones((3,))}
    params = {"w": jnp.zeros((3,))}
    out = ema_update(ema, params, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9)


def test_dataset_min_max_modes(tiny_dataset):
    ds_log = FEADataset(
        tiny_dataset, image_size=32, conditions_per_plate=2, num_steps=3
    )
    ds_mm = FEADataset(
        tiny_dataset,
        image_size=32,
        conditions_per_plate=2,
        num_steps=3,
        min_max_magnitude=(0, 1000),
        min_max_youngs_modulus=(0, 411000),
    )
    s_log = ds_log[1]
    s_mm = ds_mm[1]
    # min-max magnitudes are scaled |v|/1000 (no step scaling, no sign)
    assert s_mm["forces"].max() <= 1.0
    assert s_mm["forces"].min() >= 0.0
    # log mode keeps signs
    assert s_log["forces"].min() <= 0.0 or s_log["forces"].max() > 0.0
    # min-max youngs modulus in [0, 1]
    m = s_mm["materials"][..., 0]
    assert m.max() <= 1.0


def test_diffusion_trainer_end_to_end(tiny_dataset, tmp_path):
    """Conditional-diffusion training loop (BASELINE config 4): train two
    steps on the tiny dataset, checkpoint, and draw a sample."""
    from fea_tpu.train.diffusion_trainer import DiffusionConfig, DiffusionTrainer

    config = DiffusionConfig(
        dataset_folder=tiny_dataset,
        dataset_image_size=32,
        conditions_per_plate=2,
        num_steps_per_condition=3,
        train_batch_size=8,
        num_train_steps=2,
        num_steps_per_milestone=2,
        timesteps=8,
        input_dim=16,
        num_stages=2,
        results_folder=str(tmp_path / "dres"),
        skip_dataset_size_check=True,
    )
    trainer = DiffusionTrainer(config)
    loss = trainer.train()
    assert np.isfinite(loss)
    assert os.path.isdir(os.path.join(str(tmp_path / "dres"), "model-final"))

    batch = trainer.dataset[0]
    cond = trainer.batch_condition(
        {k: v[None] for k, v in batch.items() if hasattr(v, "shape")}
    )
    samples = trainer.sample(cond, num_steps=4)
    assert samples.shape == (1, 32, 32, 2)
    assert np.isfinite(np.asarray(samples)).all()

    trainer2 = DiffusionTrainer(config)
    trainer2.load_checkpoint("final")
    assert int(trainer2.state.step) == 2


def test_dataset_from_strain_interleaved_ranges(tmp_path):
    """Datasets generated with --save_strain/--save_stress interleave all
    fields' range lines per step in ranges.txt (pipeline's write order);
    FEADataset must look displacement ranges up BY NAME, not by
    positional (step-1)*2 stride (the reference's fragility,
    model/diffusion.py:359-379)."""
    data_dir = str(tmp_path / "data")
    generate_data(
        data_dir=data_dir,
        image_size=64,
        num_plates=1,
        conditions_per_plate=1,
        mesh_size=0.08,
        holes_per_polygon_range=(0, 0),
        num_steps_per_condition=3,
        save_strain=True,
        save_stress=True,
        save_meshes=True,
        seed=6,
        verbose=False,
    )
    # ranges.txt now interleaves displacement/strain/stress per step
    with open(os.path.join(data_dir, "1", "1", "ranges.txt")) as f:
        names = [l.split(":")[0] for l in f.readlines()]
    assert any(n.startswith("strain") for n in names)
    assert any(n.startswith("displacement_x") for n in names)

    ds = FEADataset(
        folder=data_dir,
        image_size=64,
        num_steps=3,
        conditions_per_plate=1,
    )
    from fea_tpu.mesh import read_vtk

    sample = ds[0]  # step 1
    u1 = read_vtk(os.path.join(data_dir, "1", "1", "domain.1.vtk"))["u"]
    r = np.asarray(sample["displacement_range"], np.float64)
    # lo_x, hi_x from the NAMED displacement_x_1 entry == VTK extremes
    np.testing.assert_allclose(r[0], u1[:, 0].min(), rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(r[1], u1[:, 0].max(), rtol=1e-5, atol=1e-9)


def test_dataset_cache_returns_identical_samples(tiny_dataset):
    ds_plain = FEADataset(
        folder=tiny_dataset, image_size=64, num_steps=3, conditions_per_plate=2
    )
    ds_cached = FEADataset(
        folder=tiny_dataset, image_size=64, num_steps=3, conditions_per_plate=2,
        cache_samples=True,
    )
    for i in range(len(ds_plain)):
        a, b = ds_plain[i], ds_cached[i]
        c = ds_cached[i]  # cache hit
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
            np.testing.assert_array_equal(b[k], c[k])
    assert len(ds_cached._cache) == len(ds_plain)


def test_checkpoint_save_with_relative_results_dir(tiny_dataset, tmp_path, monkeypatch):
    """Regression: a RELATIVE --results_dir crashed the first milestone
    save (orbax writes absolute paths; the zip arcname used
    relative_to(results_folder) and raised ValueError)."""
    monkeypatch.chdir(tmp_path)
    config = TrainerConfig(
        dataset_folder=tiny_dataset,
        sample_dataset_folder=tiny_dataset,
        dataset_image_size=32,
        train_batch_size=8,
        num_gradient_accumulation_steps=2,
        num_train_steps=1,
        num_steps_per_condition=3,
        num_steps_per_sample_condition=3,
        conditions_per_plate=2,
        num_sample_conditions_per_plate=2,
        results_folder="rel_results",  # relative on purpose
        skip_dataset_size_check=True,
    )
    trainer = Trainer(config)
    trainer.save_checkpoint("best")
    assert (tmp_path / "rel_results" / "model-best").is_dir()
    assert (tmp_path / "rel_results" / "model-best.zip").is_file()


def test_auto_resume_picks_newest_milestone(tiny_dataset, tmp_path):
    config = TrainerConfig(
        dataset_folder=tiny_dataset,
        sample_dataset_folder=tiny_dataset,
        dataset_image_size=32,
        train_batch_size=8,
        num_gradient_accumulation_steps=2,
        num_train_steps=1,
        num_steps_per_condition=3,
        num_steps_per_sample_condition=3,
        conditions_per_plate=2,
        num_sample_conditions_per_plate=2,
        results_folder=str(tmp_path / "res"),
        skip_dataset_size_check=True,
    )
    trainer = Trainer(config)
    trainer.save_checkpoint("best")  # step 0
    trainer.state = trainer.state.replace(step=trainer.state.step + 7)
    trainer.save_checkpoint("latest")  # step 7 — newer despite the name
    assert trainer._newest_milestone() == "latest"
    trainer.state = trainer.state.replace(step=trainer.state.step * 0)
    trainer.load_checkpoint("auto")
    assert int(np.asarray(trainer.state.step)) == 7


@pytest.mark.parametrize("dtype", [None, "bfloat16"])
def test_transfer_packing_is_bit_exact(tiny_dataset, tmp_path, dtype):
    """pack_transfers shrinks the host->device upload (±1 masks as int8;
    bf16-compute inputs pre-cast) without changing a single bit of the
    training computation: one train step packed vs unpacked from the
    same initial state must produce exactly equal losses and params."""
    def make(pack, tag):
        cfg = TrainerConfig(
            dataset_folder=tiny_dataset,
            sample_dataset_folder=tiny_dataset,
            dataset_image_size=32,
            train_batch_size=8,
            num_gradient_accumulation_steps=2,
            num_train_steps=1,
            num_steps_per_condition=3,
            num_steps_per_sample_condition=3,
            conditions_per_plate=2,
            num_sample_conditions_per_plate=2,
            results_folder=str(tmp_path / f"res_{tag}"),
            skip_dataset_size_check=True,
            input_dim=16,
            seed=3,
            compute_dtype=dtype,
            pack_transfers=pack,
        )
        return Trainer(cfg)

    t_packed, t_plain = make(True, "p"), make(False, "u")
    b_packed, b_plain = t_packed._fetch_batch(0), t_plain._fetch_batch(0)
    assert b_packed["geometry"].dtype == np.int8
    assert b_plain["geometry"].dtype == np.float32
    if dtype == "bfloat16":
        import jax.numpy as jnp

        assert b_packed["forces"].dtype == jnp.bfloat16
    s1, l1 = t_packed._train_step(t_packed.state, b_packed)
    s2, l2 = t_plain._train_step(t_plain.state, b_plain)
    assert float(l1) == float(l2)
    import jax

    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_auto_resume_without_checkpoint_starts_fresh(tiny_dataset, tmp_path):
    """A supervisor can always pass --checkpoint auto: before the first
    milestone ever saved there is nothing to restore and training must
    start fresh instead of dying (crash-resume before step
    num_steps_per_milestone)."""
    config = TrainerConfig(
        dataset_folder=tiny_dataset,
        sample_dataset_folder=tiny_dataset,
        dataset_image_size=32,
        train_batch_size=8,
        num_gradient_accumulation_steps=2,
        num_train_steps=1,
        num_steps_per_condition=3,
        num_steps_per_sample_condition=3,
        conditions_per_plate=2,
        num_sample_conditions_per_plate=2,
        results_folder=str(tmp_path / "res_empty"),
        skip_dataset_size_check=True,
    )
    trainer = Trainer(config)
    assert trainer._newest_milestone() is None
    trainer.load_checkpoint("auto")  # must not raise
    assert int(np.asarray(trainer.state.step)) == 0


def test_remat_loss_matches_plain(tiny_dataset, tmp_path):
    """remat_loss (jax.checkpoint on the per-micro loss) recomputes the
    identical forward during backward: one train step must match the
    plain step from the same init to float tolerance."""
    def make(remat, tag):
        cfg = TrainerConfig(
            dataset_folder=tiny_dataset,
            sample_dataset_folder=tiny_dataset,
            dataset_image_size=32,
            train_batch_size=8,
            num_gradient_accumulation_steps=2,
            num_train_steps=1,
            num_steps_per_condition=3,
            num_steps_per_sample_condition=3,
            conditions_per_plate=2,
            num_sample_conditions_per_plate=2,
            results_folder=str(tmp_path / f"rm_{tag}"),
            skip_dataset_size_check=True,
            input_dim=16,
            seed=3,
            remat_loss=remat,
        )
        return Trainer(cfg)

    t_r, t_p = make(True, "r"), make(False, "p")
    s1, l1 = t_r._train_step(t_r.state, t_r._fetch_batch(0))
    s2, l2 = t_p._train_step(t_p.state, t_p._fetch_batch(0))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    import jax

    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )


def test_load_checkpoint_ema_structure_mismatch(tiny_dataset, tmp_path):
    """The raw-vs-EMA eval loop restores one checkpoint under BOTH
    template shapes: sampling an EMA-trained checkpoint without
    --use_ema must adapt from the on-disk structure (not crash with an
    orbax tree mismatch), and asking for EMA weights a checkpoint does
    not carry must fail loudly (trainer.py load_checkpoint)."""
    import jax

    base = dict(
        dataset_folder=tiny_dataset,
        sample_dataset_folder=tiny_dataset,
        dataset_image_size=32,
        train_batch_size=8,
        num_gradient_accumulation_steps=2,
        num_train_steps=1,
        num_steps_per_condition=3,
        num_steps_per_sample_condition=3,
        conditions_per_plate=2,
        num_sample_conditions_per_plate=2,
        skip_dataset_size_check=True,
        input_dim=16,
        seed=0,
    )
    res_ema = str(tmp_path / "res_ema")
    t_ema = Trainer(TrainerConfig(**base, results_folder=res_ema, use_ema=True))
    assert t_ema.state.ema_params is not None
    t_ema.save_checkpoint("best")

    # raw template <- EMA checkpoint: adapts, params restored, EMA dropped
    t_raw = Trainer(
        TrainerConfig(
            **base, results_folder=res_ema, use_ema=False, inference_only=True
        )
    )
    t_raw.load_checkpoint("best")
    assert t_raw.state.ema_params is None
    for a, b in zip(
        jax.tree.leaves(t_ema.state.params), jax.tree.leaves(t_raw.state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    # EMA template <- non-EMA checkpoint: loud, actionable error
    res_plain = str(tmp_path / "res_plain")
    t_plain = Trainer(
        TrainerConfig(**base, results_folder=res_plain, use_ema=False)
    )
    t_plain.save_checkpoint("best")
    t_want_ema = Trainer(
        TrainerConfig(
            **base, results_folder=res_plain, use_ema=True, inference_only=True
        )
    )
    with pytest.raises(ValueError, match="no EMA"):
        t_want_ema.load_checkpoint("best")


def test_non_finite_guard_skips_update(tiny_dataset, tmp_path):
    """A poisoned batch (NaN) must not change params/opt/EMA — the
    in-graph non-finite guard skips the update (2026-08-18 production
    incident: one inf grad -> clip-by-global-norm -> NaN params)."""
    config = TrainerConfig(
        dataset_folder=tiny_dataset,
        sample_dataset_folder=tiny_dataset,
        dataset_image_size=32,
        train_batch_size=16,
        num_train_steps=2,
        num_steps_per_condition=3,
        num_steps_per_sample_condition=3,
        conditions_per_plate=2,
        num_sample_conditions_per_plate=2,
        results_folder=str(tmp_path / "results_nanguard"),
        skip_dataset_size_check=True,
        use_ema=True,
        input_dim=16,
        seed=0,
        progress_bar=False,
    )
    trainer = Trainer(config)
    batch = trainer._fetch_batch(0)

    import jax

    bad = dict(batch)
    key = "forces" if "forces" in bad else sorted(
        k for k, v in bad.items() if np.asarray(v).dtype.kind == "f"
    )[0]
    arr = np.array(bad[key], np.float32)
    arr[0] = np.nan
    bad[key] = arr

    before = jax.device_get(trainer.state)
    state_bad, loss_bad = trainer._train_step(trainer.state, bad)
    assert not np.isfinite(float(loss_bad))
    after = jax.device_get(state_bad)
    for a, b in zip(jax.tree.leaves(before.params), jax.tree.leaves(after.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(before.ema_params), jax.tree.leaves(after.ema_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(before.opt_states), jax.tree.leaves(after.opt_states)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(after.step) == int(before.step) + 1  # step still advances

    # and a clean batch still updates params
    state_ok, loss_ok = trainer._train_step(state_bad, batch)
    assert np.isfinite(float(loss_ok))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(after.params),
            jax.tree.leaves(jax.device_get(state_ok).params),
        )
    )
    assert changed
