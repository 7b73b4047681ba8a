"""Config parsing + app pipeline tests: every shipped YAML builds; the train
CLI and free-energy evaluation run end-to-end on a small analytic config."""

import dataclasses
import glob
import os

import jax
import numpy as np
import pytest
import yaml

from normalizingflow_tpu.config import (
    infer_boxlength,
    load_config,
    setup_model,
)

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
ALL_CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))
# dataset-backed configs need trajectory files; build/check model only
DATA_BACKED = {"LJ", "Fe_100K", "Fe_400K", "Fe_700K", "Polymer",
               "Polymer_rnvp", "Phi4"}


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=os.path.basename)
def test_config_parses_and_builds(path):
    cfg = load_config(path)
    assert cfg.dataset.name is not None
    if cfg.dataset.name in DATA_BACKED:
        # model (flow+prior) must build even without data files
        import normalizingflow_tpu.config as C

        b, boxlength = infer_boxlength(cfg.dataset)
        prior = C.build_potential(
            cfg.prior.type, cfg.prior, cfg.dataset, boxlength=boxlength
        )
        chain = C.build_flow_stack(cfg, b)
        from normalizingflow_tpu.bijectors import Chain, Repeat

        assert prior is not None
        assert (isinstance(chain, Repeat) and chain.n > 0) or (
            isinstance(chain, Chain) and len(chain.bijectors) > 0
        )
    else:
        flow, potential, cfg2 = setup_model(cfg)
        # one forward pass through the built model
        n = cfg.dataset.nparticles * cfg.dataset.dim
        params = flow.init(jax.random.PRNGKey(0))
        x = potential.sample(jax.random.PRNGKey(1), 3)
        lp = flow.log_prob(params, x)
        assert lp.shape == (3,) and bool(np.all(np.isfinite(np.asarray(lp))))


def test_boxlength_inference_matches_reference():
    """setup.py:39-45: B=(N/(8 rho))^(1/3); B=ncellx*cell_len/2."""
    cfg = load_config(os.path.join(CONFIG_DIR, "Einstein.yaml"))
    b, box = infer_boxlength(cfg.dataset)
    np.testing.assert_allclose(b, (32 / (8 * 1.28)) ** (1 / 3), rtol=1e-12)
    np.testing.assert_allclose(box, 2 * b, rtol=1e-12)

    cfg = load_config(os.path.join(CONFIG_DIR, "Fe_400K.yaml"))
    b, box = infer_boxlength(cfg.dataset)
    np.testing.assert_allclose(b, 3 * 2.9115 / 2, rtol=1e-12)


def test_train_cli_and_fe_eval(tmp_path):
    """Full app pipeline on the 2-D mixture: train CLI -> checkpoint ->
    free-energy estimates near 0 (model trained to match the target)."""
    from normalizingflow_tpu.apps.fe_eval import fe_diff
    from normalizingflow_tpu.apps.test import load_trained
    from normalizingflow_tpu.apps.train import main as train_main

    base = yaml.safe_load(
        open(os.path.join(CONFIG_DIR, "Gaussian_rnvp.yaml"))
    )
    base["train_parameters"]["max_epochs"] = 400
    base["output"] = {
        "training_dir": str(tmp_path / "train") + "/",
        "testing_dir": str(tmp_path / "test") + "/",
        "model_dir": str(tmp_path / "models") + "/",
        "best_model_dir": str(tmp_path / "best") + "/",
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(base))

    assert train_main([str(cfg_path)]) == 0
    ckpt = tmp_path / "models" / "Gaussian_rnvp_2l.msgpack"
    assert ckpt.exists()

    cfg = load_config(str(cfg_path))
    flow, params, potential, cfg = load_trained(cfg, mode="testing")
    out = fe_diff(
        flow, params, potential, jax.random.PRNGKey(5), nsamples=500,
        n_particles=cfg.dataset.nparticles, kT=cfg.dataset.kT,
        plot_path=str(tmp_path / "Q.png"),
    )
    # model ~ target => per-particle Delta F ~ entropy mismatch, near zero,
    # and the four estimators must agree with each other
    assert abs(out["bar"]) < 0.5
    assert abs(out["bar"] - out["emus"]) < 0.1
    assert abs(out["bar"] - out["md"]) < 0.2
    assert abs(out["bar"] - out["nf"]) < 0.2
    assert (tmp_path / "Q.png").exists()


def test_sample_data_app(tmp_path):
    """HMC data generation for a small LJ config."""
    from normalizingflow_tpu.apps.sample_data import main as gen_main

    base = yaml.safe_load(open(os.path.join(CONFIG_DIR, "LJ.yaml")))
    base["dataset"]["training_data"] = str(tmp_path / "lj_train.npy")
    base["dataset"]["testing_data"] = str(tmp_path / "lj_test.npy")
    base["prior"]["centers"] = os.path.join(
        CONFIG_DIR, "..", "data", "lj_fcc_ref.xyz"
    )
    cfg_path = tmp_path / "lj.yaml"
    cfg_path.write_text(yaml.safe_dump(base))
    assert gen_main([str(cfg_path), "128"]) == 0
    train = np.load(tmp_path / "lj_train.npy")
    assert train.shape[1] == 96 and np.all(np.isfinite(train))


def test_sample_data_segmented_generation(tmp_path):
    """nframes needing > 8 draws must run the segmented path (r4: one
    giant warmup+40-draw dispatch reproducibly crashed the TPU worker on
    the EAM target; generation now continues in <= 8-draw segments from
    the carried state) and still deliver the exact frame count."""
    from normalizingflow_tpu.apps.sample_data import generate
    from normalizingflow_tpu.config import load_config

    base = yaml.safe_load(open(os.path.join(CONFIG_DIR, "Einstein.yaml")))
    cfg_path = tmp_path / "einstein.yaml"
    cfg_path.write_text(yaml.safe_dump(base))
    cfg = load_config(str(cfg_path))
    frames, acc = generate(cfg, nframes=200, chains=16, seed=3)
    # 200 frames / 16 chains = 13 draws -> segments of 8 + 5
    assert frames.shape == (200, 96)
    assert np.all(np.isfinite(frames))
    assert 0.5 < acc <= 1.0


def test_checkpoint_restores_jax_arrays(tmp_path):
    """Restored params must be device arrays: numpy leaves break traced
    indexing in the AR inverse scan (regression from the LJ E2E run)."""
    import jax.numpy as jnp

    from normalizingflow_tpu import NormalizingFlow, bijectors, distributions
    from normalizingflow_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    flow = NormalizingFlow(
        distributions.DiagNormal(4),
        bijectors.Chain([bijectors.SplineAR(4, num_bins=4, hidden_dim=8)]),
    )
    params = flow.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "ck.msgpack")
    save_checkpoint(path, {"params": params})
    restored = load_checkpoint(path, {"params": params})["params"]
    assert all(
        isinstance(leaf, jnp.ndarray) for leaf in jax.tree.leaves(restored)
    )
    # the failing path: sampling (inverse scan) with restored params
    x, log_px, _ = flow.sample(restored, jax.random.PRNGKey(1), 8)
    assert np.all(np.isfinite(np.asarray(x)))


def test_lj_update_data_kwarg_attaches_dataset():
    """update_data(data=...) must attach a dataset even when none exists yet
    (regression: the data kwarg was dropped on first attach)."""
    import numpy as np

    from normalizingflow_tpu.targets.eam import EAMIron
    from normalizingflow_tpu.targets.lj import LennardJones

    frames = np.random.default_rng(0).uniform(0, 4.0, (10, 24))
    lj = LennardJones(8, 4.0)
    lj.update_data(data=frames)
    out = lj.sample(jax.random.PRNGKey(0), 4)
    assert out.shape == (4, 24)

    fe = EAMIron(8, boxlength=4.0)
    fe.update_data(data=frames)
    assert fe.sample(jax.random.PRNGKey(0), 3).shape == (3, 24)


def test_fused_resume_is_bit_exact(tmp_path):
    """Interrupted-and-resumed training equals the uninterrupted run.

    Per-step minibatch keys are fold_in(key, absolute_step), so a resumed
    run replays the identical data stream; params, optimizer state, and the
    cosine schedule position restore from the .last full-state checkpoint.
    """
    from normalizingflow_tpu import NormalizingFlow, bijectors, distributions
    from normalizingflow_tpu.train.fused import train_flow_fused

    target = distributions.GaussianMixture(
        [[0.6, 0.6]], [0.3], npoints=4, point_dim=2
    )
    flow = NormalizingFlow(
        distributions.DiagNormal(8),
        bijectors.Chain([bijectors.AffineCoupling(8, hidden_dim=16)]),
    )
    key = jax.random.PRNGKey(7)
    # Exponential schedule: LR at step t is independent of max_epochs, so a
    # leg trained to 150 matches the first 150 steps of the 300-step run.
    # (Cosine resume also works, but only with the original max_epochs --
    # which the CLI passes from the config.)
    kwargs = dict(batch_size=16, learning_rate=1e-3, scheduler="exponential",
                  output_freq=100, chunk=150)

    ckpt_a = str(tmp_path / "a.msgpack")
    params_full, _ = train_flow_fused(
        flow, key, target, max_epochs=300, checkpoint_path=ckpt_a, **kwargs
    )

    ckpt_b = str(tmp_path / "b.msgpack")
    train_flow_fused(
        flow, key, target, max_epochs=150, checkpoint_path=ckpt_b, **kwargs
    )
    params_resumed, hist = train_flow_fused(
        flow, key, target, max_epochs=300, checkpoint_path=ckpt_b,
        resume_from=ckpt_b + ".last", **kwargs
    )

    flat_a = jax.tree_util.tree_leaves(params_full)
    flat_b = jax.tree_util.tree_leaves(params_resumed)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_resume_already_complete(tmp_path):
    """Resuming from a checkpoint at epoch >= max_epochs must report
    completion (history['already_complete']) and return the checkpointed
    params unchanged instead of silently no-opping."""
    from normalizingflow_tpu import NormalizingFlow, bijectors, distributions
    from normalizingflow_tpu.train.fused import train_flow_fused

    target = distributions.GaussianMixture(
        [[0.0, 0.0]], [1.0], npoints=4, point_dim=2
    )
    flow = NormalizingFlow(
        distributions.DiagNormal(8),
        bijectors.Chain([bijectors.ActNorm(8)]),
    )
    key = jax.random.PRNGKey(11)
    ckpt = str(tmp_path / "c.msgpack")
    kwargs = dict(batch_size=16, learning_rate=1e-3,
                  scheduler="exponential", output_freq=50, chunk=50)
    params, _ = train_flow_fused(
        flow, key, target, max_epochs=50, checkpoint_path=ckpt, **kwargs
    )
    params2, hist = train_flow_fused(
        flow, key, target, max_epochs=50, checkpoint_path=ckpt,
        resume_from=ckpt + ".last", **kwargs
    )
    assert hist.get("already_complete") is True
    assert hist["steps_per_s"] == 0.0
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_hmc_mixing_gate():
    """Acceptance-gated HMC data mixing in the fused train loop
    (reference train.py:14-19): acceptance in (0.3, 0.6) trains the MIX
    EPOCH's batch (one epoch per cadence, not every batch) on the mixer's
    relaxed data; outside the band every batch comes from the dataset."""
    import jax.numpy as jnp

    from normalizingflow_tpu import NormalizingFlow, bijectors, distributions
    from normalizingflow_tpu.train.fused import train_flow_fused

    source = distributions.DiagNormal(2)

    def make_flow():
        return NormalizingFlow(
            distributions.DiagNormal(2),
            bijectors.Chain([bijectors.ActNorm(2)]),
        )

    mix_data = jnp.full((64, 2), 5.0)
    kwargs = dict(max_epochs=800, batch_size=32, learning_rate=0.05,
                  scheduler="constant", output_freq=100, chunk=400)

    base_flow = make_flow()
    base_params, _ = train_flow_fused(
        base_flow, jax.random.PRNGKey(0), source, **kwargs
    )

    flow = make_flow()
    params, hist = train_flow_fused(
        flow, jax.random.PRNGKey(0), source,
        hmc_mixer=lambda k, p: (mix_data, 0.45), **kwargs
    )
    assert hist["hmc_mixing"][0]["mixed"] is True
    # the mix epochs must have influenced training ...
    deltas = [
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(base_params))
    ]
    assert max(deltas) > 1e-4, "accepted gate must train on mix data"
    # ... but only ONE batch per cadence: the model must NOT be dragged to
    # the mix data's mean (round-2 regression: every batch used mix data
    # until the next check, blowing the loss up on LJ).
    x, _, _ = flow.sample(params, jax.random.PRNGKey(1), 256)
    assert abs(float(jnp.mean(x))) < 1.0, (
        "mix data must only affect the mix epoch's batch")

    flow2 = make_flow()
    params2, hist2 = train_flow_fused(
        flow2, jax.random.PRNGKey(0), source,
        hmc_mixer=lambda k, p: (mix_data, 0.9), **kwargs
    )
    assert hist2["hmc_mixing"][0]["mixed"] is False
    # failed gate: same training stream as the no-mixer run (the gated
    # program has extra no-op `where`s, so only near-exact, not bit-exact)
    for a, b in zip(jax.tree_util.tree_leaves(params2),
                    jax.tree_util.tree_leaves(base_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_train_cli_hmc_mix(tmp_path, caplog):
    """--hmc-mix / train_parameters.hmc_mix wires collect_hmc_data into the
    fused loop (xyz snapshots are skipped for this 2-D toy; see
    test_collect_hmc_data_writes_xyz for the 3-D write path)."""
    import logging

    from normalizingflow_tpu.apps.train import main as train_main

    base = yaml.safe_load(
        open(os.path.join(CONFIG_DIR, "Gaussian_rnvp.yaml"))
    )
    base["train_parameters"]["max_epochs"] = 400
    base["train_parameters"]["hmc_mix"] = True
    base["train_parameters"]["hmc_mix_step_size"] = 0.3
    base["train_parameters"]["hmc_mix_leapfrog"] = 5
    base["output"] = {
        "training_dir": str(tmp_path / "train") + "/",
        "testing_dir": str(tmp_path / "test") + "/",
        "model_dir": str(tmp_path / "models") + "/",
        "best_model_dir": str(tmp_path / "best") + "/",
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(base))
    with caplog.at_level(logging.INFO, logger="normalizingflow_tpu.train"):
        assert train_main([str(cfg_path)]) == 0
    assert "HMC mix at epoch 0" in caplog.text


def test_best_checkpoint_is_copy_of_fresh_last(tmp_path):
    """The best-model file (reference train.py:37-40 gate) is produced by an
    on-disk copy of a just-written .last -- never a second device fetch --
    and both restore cleanly."""
    from normalizingflow_tpu import NormalizingFlow, bijectors, distributions
    from normalizingflow_tpu.train.checkpoint import load_checkpoint
    from normalizingflow_tpu.train.fused import train_flow_fused

    target = distributions.GaussianMixture(
        [[0.6, 0.6]], [0.3], npoints=4, point_dim=2
    )
    flow = NormalizingFlow(
        distributions.DiagNormal(8),
        bijectors.Chain([bijectors.AffineCoupling(8, hidden_dim=16)]),
    )
    ckpt = str(tmp_path / "m.msgpack")
    params, hist = train_flow_fused(
        flow, jax.random.PRNGKey(3), target, max_epochs=100, batch_size=16,
        learning_rate=1e-3, scheduler="exponential", output_freq=50,
        checkpoint_path=ckpt, chunk=50,
    )
    # single chunk (chunk clamps to max_epochs=100): best == .last exactly
    with open(ckpt, "rb") as f1, open(ckpt + ".last", "rb") as f2:
        assert f1.read() == f2.read()
    template = {"params": flow.init(jax.random.PRNGKey(0)),
                "opt_state": None, "key": None, "epoch": 0, "losses": None}
    state = load_checkpoint(ckpt, template)
    assert int(state["epoch"]) == 100
    for a, b in zip(jax.tree_util.tree_leaves(state["params"]),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
