"""Training-runtime tests: LR schedules vs torch semantics, optimizer/train-step
on an 8-device CPU mesh (data-parallel), and loss decrease over a few steps."""

import pathlib
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsinger_tpu.training.schedules import build_lr_schedule


def test_step_lr_matches_torch_semantics():
    sched = build_lr_schedule(
        {"scheduler_cls": "torch.optim.lr_scheduler.StepLR", "step_size": 10, "gamma": 0.5},
        base_lr=1.0,
    )
    assert sched(0) == 1.0
    assert sched(9) == 1.0
    assert sched(10) == 0.5
    assert sched(25) == 0.25


def test_rsqrt_schedule():
    sched = build_lr_schedule(
        {"scheduler_cls": "utils.training_utils.RSQRTSchedule", "warmup_updates": 100},
        base_lr=1.0, hidden_size=256,
    )
    # during warmup grows linearly; beyond warmup decays as step^-0.5
    assert sched(50) == pytest.approx(0.5 * 100 ** -0.5 * 256 ** -0.5)
    assert sched(400) == pytest.approx(400 ** -0.5 * 256 ** -0.5)


def test_warmup_cosine_schedule():
    sched = build_lr_schedule(
        {"scheduler_cls": "utils.training_utils.WarmupCosineSchedule",
         "warmup_steps": 10, "t_total": 110},
        base_lr=2.0,
    )
    assert sched(5) == pytest.approx(1.0)
    assert sched(10) == pytest.approx(2.0)
    assert sched(60) == pytest.approx(1.0)  # half way: cos(pi/2)->0.5 factor
    assert sched(110) == pytest.approx(0.0, abs=1e-9)


def test_sequential_lr():
    sched = build_lr_schedule(
        {
            "scheduler_cls": "torch.optim.lr_scheduler.SequentialLR",
            "schedulers": [
                {"cls": "torch.optim.lr_scheduler.ConstantLR", "factor": 0.1, "total_iters": 5},
                {"cls": "torch.optim.lr_scheduler.StepLR", "step_size": 10, "gamma": 0.5},
            ],
            "milestones": [5],
        },
        base_lr=1.0,
    )
    assert sched(0) == pytest.approx(0.1)
    assert sched(5) == pytest.approx(1.0)
    assert sched(15) == pytest.approx(0.5)


@pytest.mark.slow
def test_dryrun_multichip_8_devices():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_recompute_grads_matches_plain_gradients():
    """recompute_grads=true (jax.checkpoint on every denoiser layer) must
    leave params, loss, and gradients bit-identical — only the backward
    memory/compute schedule changes. Covers both backbone families."""
    import jax.numpy as jnp
    import __graft_entry__ as ge
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic, DiffSingerVariance
    from diffsinger_tpu.training.acoustic_task import make_acoustic_loss_fn
    from diffsinger_tpu.training.variance_task import make_variance_loss_fn

    hp = ge._acoustic_hparams(tiny=True)
    batch = ge._example_batch(2, 16, 64, hp["audio_num_mel_bins"])
    grads = {}
    for remat in (False, True):
        hp2 = dict(hp, recompute_grads=remat)
        model = DiffSingerAcoustic(hp2, vocab_size=62, out_dims=hp["audio_num_mel_bins"])
        params = model.init(jax.random.PRNGKey(0))
        loss_fn = make_acoustic_loss_fn(model)
        g = jax.grad(lambda p: loss_fn(p, batch, jax.random.PRNGKey(3))[0])(params)
        grads[remat] = (params, g)
    p0, g0 = grads[False]
    p1, g1 = grads[True]
    assert jax.tree_util.tree_structure(g0) == jax.tree_util.tree_structure(g1)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # wavenet family via the variance model (pitch/variance denoisers)
    hp_v = ge._variance_hparams()
    batch_v = ge._variance_batch(2, 16, 64)
    grads_v = {}
    for remat in (False, True):
        hp2 = dict(hp_v, recompute_grads=remat)
        model = DiffSingerVariance(hp2, vocab_size=62)
        params = model.init(jax.random.PRNGKey(0))
        loss_fn = make_variance_loss_fn(model)
        grads_v[remat] = jax.grad(lambda p: loss_fn(p, batch_v, jax.random.PRNGKey(3))[0])(params)
    for a, b in zip(jax.tree.leaves(grads_v[False]), jax.tree.leaves(grads_v[True])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_padded_batch_rows_are_loss_masked():
    """pad_batch_rows duplicates the last item but zeroes tokens/mel2ph so the
    padding carries zero loss weight: the loss must be invariant to the pad
    rows' payload (a duplicated item previously multiplied its gradient)."""
    import __graft_entry__ as ge
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.training.acoustic_task import make_acoustic_loss_fn
    from diffsinger_tpu.training.base_task import pad_batch_rows

    hp = ge._acoustic_hparams(tiny=True)
    model = DiffSingerAcoustic(hp, vocab_size=62, out_dims=hp["audio_num_mel_bins"])
    params = model.init(jax.random.PRNGKey(0))
    loss_fn = make_acoustic_loss_fn(model)

    batch = {k: np.asarray(v) for k, v in
             ge._example_batch(3, 16, 64, hp["audio_num_mel_bins"]).items()}
    padded = pad_batch_rows({k: v.copy() for k, v in batch.items()}, 3, 4)
    assert padded["tokens"].shape[0] == 4
    # pad row is fully masked out of every loss
    assert (padded["tokens"][3] == 0).all() and (padded["mel2ph"][3] == 0).all()
    loss_a, _ = loss_fn(params, padded, jax.random.PRNGKey(5))
    # garble the pad row's unmasked payload: loss must not change
    garbled = {k: v.copy() for k, v in padded.items()}
    garbled["mel"][3] = 5.0
    garbled["f0"][3] = 440.0
    loss_b, _ = loss_fn(params, garbled, jax.random.PRNGKey(5))
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    assert np.isfinite(float(loss_a))


def test_padded_batch_rows_are_loss_masked_variance():
    """Same invariance for the variance family: dur loss is masked by
    tokens > 0 and pitch/variance losses by mel2ph > 0, so a pad row's
    payload must not change the loss."""
    import __graft_entry__ as ge
    from diffsinger_tpu.models.toplevel import DiffSingerVariance
    from diffsinger_tpu.training.variance_task import make_variance_loss_fn
    from diffsinger_tpu.training.base_task import pad_batch_rows

    hp = ge._variance_hparams()
    model = DiffSingerVariance(hp, vocab_size=62)
    params = model.init(jax.random.PRNGKey(0))
    loss_fn = make_variance_loss_fn(model)

    batch = {k: np.asarray(v) for k, v in ge._variance_batch(3, 16, 64).items()}
    padded = pad_batch_rows({k: v.copy() for k, v in batch.items()}, 3, 4)
    assert (padded["tokens"][3] == 0).all() and (padded["mel2ph"][3] == 0).all()
    loss_a, _ = loss_fn(params, padded, jax.random.PRNGKey(5))
    garbled = {k: v.copy() for k, v in padded.items()}
    garbled["pitch"][3] = 90.0
    garbled["energy"][3] = -5.0
    garbled["ph_dur"][3] = 2.0
    loss_b, _ = loss_fn(params, garbled, jax.random.PRNGKey(5))
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    assert np.isfinite(float(loss_a))


def test_acoustic_train_step_loss_decreases():
    """A few optimizer steps on one fixed batch should reduce the loss."""
    import __graft_entry__ as ge
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.training.acoustic_task import make_acoustic_loss_fn
    from diffsinger_tpu.training.train_state import (
        build_optimizer, create_train_state, make_train_step,
    )

    hp = ge._acoustic_hparams(tiny=True)
    hp["optimizer_args"] = dict(hp["optimizer_args"], lr=1e-3)
    model = DiffSingerAcoustic(hp, vocab_size=62, out_dims=hp["audio_num_mel_bins"])
    params = model.init(jax.random.PRNGKey(0))
    tx, sched = build_optimizer(hp)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(make_acoustic_loss_fn(model), tx))
    batch = ge._example_batch(2, 16, 64, hp["audio_num_mel_bins"])

    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(3))
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


@pytest.mark.slow
def test_variance_train_step_runs():
    from diffsinger_tpu.config import load_config
    from diffsinger_tpu.models.toplevel import DiffSingerVariance
    from diffsinger_tpu.training.train_state import (
        build_optimizer, create_train_state, make_train_step,
    )
    from diffsinger_tpu.training.variance_task import make_variance_loss_fn, random_retake_masks

    hp = load_config(str(pathlib.Path(__file__).resolve().parents[1] / "configs" / "variance.yaml"), save_snapshot=False)
    hp.update(hidden_size=32, enc_layers=1, predict_energy=True)
    hp["dur_prediction_args"] = dict(hp["dur_prediction_args"], hidden_size=32, num_layers=2)
    hp["pitch_prediction_args"] = dict(
        hp["pitch_prediction_args"], repeat_bins=8,
        backbone_args=dict(num_layers=2, num_channels=16, dilation_cycle_length=2),
    )
    hp["variances_prediction_args"] = dict(
        hp["variances_prediction_args"], total_repeat_bins=8,
        backbone_args=dict(num_layers=2, num_channels=16, dilation_cycle_length=2),
    )

    model = DiffSingerVariance(hp, vocab_size=40)
    params = model.init(jax.random.PRNGKey(0))
    tx, _ = build_optimizer(hp)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(make_variance_loss_fn(model), tx))

    b, t_ph, t_s = 2, 12, 48
    rng = np.random.default_rng(0)
    batch = {
        "tokens": jnp.asarray(np.concatenate([rng.integers(1, 39, (b, 10)), np.zeros((b, 2))], 1).astype(np.int32)),
        "ph_dur": jnp.asarray(np.pad(np.full((b, 10), 4), ((0, 0), (0, 2))).astype(np.int32)),
        "ph2word": jnp.asarray(np.pad(np.repeat(np.arange(1, 6), 2)[None].repeat(b, 0), ((0, 0), (0, 2))).astype(np.int32)),
        "midi": jnp.asarray(np.full((b, t_ph), 60, np.int32)),
        "mel2ph": jnp.asarray(np.pad(np.repeat(np.arange(1, 11), 4)[None].repeat(b, 0), ((0, 0), (0, 8))).astype(np.int32)),
        "base_pitch": jnp.asarray(np.full((b, t_s), 60.0, np.float32)),
        "pitch": jnp.asarray(np.full((b, t_s), 61.0, np.float32)),
        "energy": jnp.asarray(rng.uniform(-60, -20, (b, t_s)).astype(np.float32)),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    assert {"dur_loss", "pitch_loss", "var_loss"} <= set(metrics)

    masks = np.asarray(random_retake_masks(jax.random.PRNGKey(0), 1000, 50))
    frac = masks.mean()
    assert 0.35 < frac < 0.65  # ~1/2 per the reference's design


def test_grad_accumulation_step_semantics():
    """accumulate_grad_batches=k: params update only every k-th micro-batch,
    and optimizer_step counts applied updates (reference global_step
    semantics), not micro-batches."""
    import jax
    import jax.numpy as jnp

    from diffsinger_tpu.training.train_state import (
        build_optimizer, create_train_state, make_train_step, optimizer_step,
    )

    hp = dict(
        optimizer_args=dict(optimizer_cls="torch.optim.AdamW", lr=0.1,
                            beta1=0.9, beta2=0.98, weight_decay=0.0),
        lr_scheduler_args=dict(scheduler_cls="torch.optim.lr_scheduler.StepLR",
                               step_size=1000, gamma=0.5),
        clip_grad_norm=0, accumulate_grad_batches=2,
    )
    tx, _ = build_optimizer(hp)

    def loss_fn(params, batch, rng):
        loss = jnp.sum((params["w"] - batch["target"]) ** 2)
        return loss, {"loss": loss}

    params = {"w": jnp.ones((4,))}
    state = create_train_state(params, tx)
    step_fn = jax.jit(make_train_step(loss_fn, tx))
    batch = {"target": jnp.zeros((4,))}

    assert optimizer_step(state) == 0
    s1, _ = step_fn(state, batch, jax.random.PRNGKey(0))
    # mid-accumulation: no update applied yet
    assert optimizer_step(s1) == 0
    assert jnp.allclose(s1.params["w"], params["w"])
    s2, _ = step_fn(s1, batch, jax.random.PRNGKey(0))
    # k-th micro-batch: update applied, counter advances by one
    assert optimizer_step(s2) == 1
    assert not jnp.allclose(s2.params["w"], params["w"])
    # micro-batch counter kept separately (rng folding stays unique)
    assert int(s2.step) == 2


def test_lr_schedule_defaults_to_steplr():
    """lr_scheduler_args without scheduler_cls falls back to StepLR (the
    configs/base.yaml default) instead of crashing."""
    from diffsinger_tpu.training.schedules import build_lr_schedule

    sched = build_lr_schedule({"step_size": 10, "gamma": 0.5}, base_lr=1.0)
    assert sched(0) == 1.0
    assert sched(10) == 0.5
    assert sched(25) == 0.25


def test_sync_gradient_step_through_freezing_wrappers():
    """Resume must restore the applied-update counter through the freezing
    wrap (multi_transform > masked > MultiSteps); a top-level isinstance
    check silently restarts LR/val cadence at 0 on a frozen+accumulating
    resume."""
    import optax

    from diffsinger_tpu.training.train_state import (
        optimizer_step, sync_gradient_step,
    )

    params = {"a": jnp.ones((3,)), "b": jnp.ones((2,))}
    inner = optax.MultiSteps(optax.adamw(1e-3), every_k_schedule=2)
    tx = optax.multi_transform(
        {"train": inner, "frozen": optax.set_to_zero()},
        {"a": "train", "b": "frozen"})
    opt_state = tx.init(params)

    synced = sync_gradient_step(opt_state, 1234)

    class S:  # minimal TrainState stand-in
        step = jnp.asarray(0, jnp.int32)
        opt_state = synced

    assert optimizer_step(S) == 1234
    # plain MultiSteps still works
    opt2 = optax.MultiSteps(optax.adamw(1e-3), 2).init(params)
    S.opt_state = sync_gradient_step(opt2, 7)
    assert optimizer_step(S) == 7


def test_lr_schedules_match_torch_exactly():
    """Every registry scheduler the reference's configs can name, validated
    step-for-step against the real torch.optim.lr_scheduler implementations
    (60 epochs), including the reference doc's SequentialLR composite example
    and a ChainedScheduler of chainable (multiplicative) schedulers."""
    import torch

    from diffsinger_tpu.training.schedules import build_lr_schedule

    base = 0.8
    cases = [
        ({"scheduler_cls": "torch.optim.lr_scheduler.StepLR",
          "step_size": 7, "gamma": 0.5},
         lambda o: torch.optim.lr_scheduler.StepLR(o, step_size=7, gamma=0.5)),
        ({"scheduler_cls": "torch.optim.lr_scheduler.ExponentialLR", "gamma": 0.97},
         lambda o: torch.optim.lr_scheduler.ExponentialLR(o, gamma=0.97)),
        ({"scheduler_cls": "torch.optim.lr_scheduler.ConstantLR",
          "factor": 0.25, "total_iters": 9},
         lambda o: torch.optim.lr_scheduler.ConstantLR(o, factor=0.25, total_iters=9)),
        ({"scheduler_cls": "torch.optim.lr_scheduler.LinearLR",
          "start_factor": 0.1, "end_factor": 0.9, "total_iters": 11},
         lambda o: torch.optim.lr_scheduler.LinearLR(
             o, start_factor=0.1, end_factor=0.9, total_iters=11)),
        ({"scheduler_cls": "torch.optim.lr_scheduler.MultiStepLR",
          "milestones": [10, 20, 45], "gamma": 0.3},
         lambda o: torch.optim.lr_scheduler.MultiStepLR(
             o, milestones=[10, 20, 45], gamma=0.3)),
        ({"scheduler_cls": "torch.optim.lr_scheduler.CosineAnnealingLR",
          "T_max": 50, "eta_min": 0.01},
         lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(o, T_max=50, eta_min=0.01)),
        # the reference ConfigurationSchemas doc's composite example shape
        ({"scheduler_cls": "torch.optim.lr_scheduler.SequentialLR",
          "schedulers": [
              {"cls": "torch.optim.lr_scheduler.ExponentialLR", "gamma": 0.5},
              {"cls": "torch.optim.lr_scheduler.LinearLR"},
              {"cls": "torch.optim.lr_scheduler.MultiStepLR", "milestones": [10, 20]},
          ],
          "milestones": [10, 20]},
         lambda o: torch.optim.lr_scheduler.SequentialLR(o, [
             torch.optim.lr_scheduler.ExponentialLR(o, gamma=0.5),
             torch.optim.lr_scheduler.LinearLR(o),
             torch.optim.lr_scheduler.MultiStepLR(o, milestones=[10, 20]),
         ], milestones=[10, 20])),
        ({"scheduler_cls": "torch.optim.lr_scheduler.ChainedScheduler",
          "schedulers": [
              {"cls": "torch.optim.lr_scheduler.ConstantLR",
               "factor": 0.5, "total_iters": 4},
              {"cls": "torch.optim.lr_scheduler.ExponentialLR", "gamma": 0.98},
          ]},
         lambda o: torch.optim.lr_scheduler.ChainedScheduler([
             torch.optim.lr_scheduler.ConstantLR(o, factor=0.5, total_iters=4),
             torch.optim.lr_scheduler.ExponentialLR(o, gamma=0.98),
         ])),
    ]
    for args, make_torch in cases:
        ours = build_lr_schedule(dict(args), base_lr=base)
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base)
        sch = make_torch(opt)
        for k in range(60):
            expected = opt.param_groups[0]["lr"]
            got = ours(k)
            assert got == pytest.approx(expected, rel=1e-6, abs=1e-9), \
                f"{args.get('scheduler_cls')} step {k}: {got} != {expected}"
            sch.step()


def test_optimizers_match_torch_trajectories():
    """build_optimizer's torch class names, validated on 20-step parameter
    trajectories against the real torch.optim implementations with shared
    explicit gradients (coupled vs decoupled weight decay, momentum/nesterov,
    RMSprop's outside-sqrt eps, Adagrad's zero accumulator init)."""
    import optax
    import torch

    from diffsinger_tpu.training.train_state import build_optimizer

    rng = np.random.default_rng(0)
    p0 = rng.normal(0, 1, (5,)).astype(np.float32)
    grads = [rng.normal(0, 1, (5,)).astype(np.float32) for _ in range(20)]

    cases = [
        ({"optimizer_cls": "torch.optim.AdamW", "lr": 0.01,
          "beta1": 0.9, "beta2": 0.98, "weight_decay": 0.05},
         lambda p: torch.optim.AdamW([p], lr=0.01, betas=(0.9, 0.98),
                                     eps=1e-8, weight_decay=0.05)),
        ({"optimizer_cls": "torch.optim.Adam", "lr": 0.02,
          "beta1": 0.8, "beta2": 0.9},
         lambda p: torch.optim.Adam([p], lr=0.02, betas=(0.8, 0.9), eps=1e-8)),
        ({"optimizer_cls": "torch.optim.SGD", "lr": 0.05,
          "momentum": 0.9, "weight_decay": 0.01},
         lambda p: torch.optim.SGD([p], lr=0.05, momentum=0.9, weight_decay=0.01)),
        ({"optimizer_cls": "torch.optim.SGD", "lr": 0.05,
          "momentum": 0.9, "nesterov": True},
         lambda p: torch.optim.SGD([p], lr=0.05, momentum=0.9, nesterov=True)),
        ({"optimizer_cls": "torch.optim.RMSprop", "lr": 0.01,
          "alpha": 0.95, "eps": 1e-8, "weight_decay": 0.02},
         lambda p: torch.optim.RMSprop([p], lr=0.01, alpha=0.95, eps=1e-8,
                                       weight_decay=0.02)),
        ({"optimizer_cls": "torch.optim.Adagrad", "lr": 0.03},
         lambda p: torch.optim.Adagrad([p], lr=0.03, eps=1e-10)),
    ]
    for opt_args, make_torch in cases:
        hp = {"optimizer_args": dict(opt_args),
              "lr_scheduler_args": {"scheduler_cls": "StepLR",
                                    "step_size": 10 ** 9, "gamma": 1.0}}
        tx, _ = build_optimizer(hp)
        params = jnp.asarray(p0)
        opt_state = tx.init(params)
        tp = torch.nn.Parameter(torch.tensor(p0))
        topt = make_torch(tp)
        for g in grads:
            updates, opt_state = tx.update(jnp.asarray(g), opt_state, params)
            params = optax.apply_updates(params, updates)
            tp.grad = torch.tensor(g)
            topt.step()
        np.testing.assert_allclose(
            np.asarray(params), tp.detach().numpy(), rtol=2e-5, atol=2e-6,
            err_msg=opt_args["optimizer_cls"])


def test_chained_scheduler_nesting_no_double_scaling():
    """Composites nested inside ChainedScheduler must contribute pure
    factors: building them at the outer lr scaled by base_lr twice
    (base=0.5 gave lr(0)=0.25 for a pass-through chain)."""
    from diffsinger_tpu.training.schedules import build_lr_schedule

    base = 0.5
    passthrough = {"scheduler_cls": "ChainedScheduler",
                   "schedulers": [{"cls": "ExponentialLR", "gamma": 1.0}]}
    inner_seq = {"scheduler_cls": "ChainedScheduler",
                 "schedulers": [
                     {"cls": "SequentialLR",
                      "schedulers": [{"cls": "ExponentialLR", "gamma": 1.0},
                                     {"cls": "ExponentialLR", "gamma": 1.0}],
                      "milestones": [5]},
                 ]}
    nested_chain = {"scheduler_cls": "ChainedScheduler",
                    "schedulers": [dict(passthrough)]}
    for args in (passthrough, inner_seq, nested_chain):
        sched = build_lr_schedule(dict(args), base_lr=base)
        assert sched(0) == pytest.approx(base), args
        assert sched(9) == pytest.approx(base), args


def test_adagrad_eps_outside_sqrt_like_torch():
    """torch Adagrad: g / (sqrt(sum g^2) + eps). optax puts eps inside the
    sqrt — a ~10x smaller update while the accumulator is below eps. Pin
    the tiny-gradient regime against torch."""
    import optax
    import torch

    from diffsinger_tpu.training.train_state import build_optimizer

    hp = {"optimizer_args": {"optimizer_cls": "torch.optim.Adagrad", "lr": 0.1},
          "lr_scheduler_args": {"scheduler_cls": "StepLR",
                                "step_size": 10 ** 9, "gamma": 1.0}}
    tx, _ = build_optimizer(hp)
    p0 = np.full((3,), 0.5, np.float32)
    grads = [np.full((3,), 1e-6, np.float32)] * 3 + \
            [np.full((3,), 1e-3, np.float32)] * 3
    params = jnp.asarray(p0)
    opt_state = tx.init(params)
    tp = torch.nn.Parameter(torch.tensor(p0))
    topt = torch.optim.Adagrad([tp], lr=0.1, eps=1e-10)
    for g in grads:
        updates, opt_state = tx.update(jnp.asarray(g), opt_state, params)
        params = optax.apply_updates(params, updates)
        tp.grad = torch.tensor(g)
        topt.step()
    np.testing.assert_allclose(np.asarray(params), tp.detach().numpy(),
                               rtol=1e-5, atol=0)


def test_optimizer_rejects_unmappable_semantic_args():
    from diffsinger_tpu.training.train_state import build_optimizer

    sched = {"scheduler_cls": "StepLR", "step_size": 10, "gamma": 0.5}
    for opt_args, match in [
        ({"optimizer_cls": "torch.optim.SGD", "lr": 0.1, "momentum": 0.9,
          "dampening": 0.5}, "dampening"),
        ({"optimizer_cls": "torch.optim.AdamW", "lr": 0.1, "amsgrad": True},
         "amsgrad"),
        ({"optimizer_cls": "torch.optim.Adagrad", "lr": 0.1, "lr_decay": 0.1},
         "lr_decay"),
    ]:
        with pytest.raises(NotImplementedError, match=match):
            build_optimizer({"optimizer_args": opt_args,
                             "lr_scheduler_args": dict(sched)})
    with pytest.raises(ValueError, match="nesterov"):
        build_optimizer({"optimizer_args": {
            "optimizer_cls": "torch.optim.SGD", "lr": 0.1, "nesterov": True},
            "lr_scheduler_args": dict(sched)})


def test_adam_coupled_weight_decay_matches_torch():
    """torch.optim.Adam's weight_decay is COUPLED (wd*p added to the grad
    before the moment updates); it must not be silently dropped."""
    import optax
    import torch

    from diffsinger_tpu.training.train_state import build_optimizer

    rng = np.random.default_rng(1)
    p0 = rng.normal(0, 1, (5,)).astype(np.float32)
    grads = [rng.normal(0, 1, (5,)).astype(np.float32) for _ in range(20)]
    hp = {"optimizer_args": {"optimizer_cls": "torch.optim.Adam", "lr": 0.02,
                             "beta1": 0.8, "beta2": 0.9, "weight_decay": 0.03},
          "lr_scheduler_args": {"scheduler_cls": "StepLR",
                                "step_size": 10 ** 9, "gamma": 1.0}}
    tx, _ = build_optimizer(hp)
    params = jnp.asarray(p0)
    opt_state = tx.init(params)
    tp = torch.nn.Parameter(torch.tensor(p0))
    topt = torch.optim.Adam([tp], lr=0.02, betas=(0.8, 0.9), eps=1e-8,
                            weight_decay=0.03)
    for g in grads:
        updates, opt_state = tx.update(jnp.asarray(g), opt_state, params)
        params = optax.apply_updates(params, updates)
        tp.grad = torch.tensor(g)
        topt.step()
    np.testing.assert_allclose(np.asarray(params), tp.detach().numpy(),
                               rtol=2e-5, atol=2e-6)


def test_dur_loss_sdur_not_diluted_by_padded_rows():
    """The sentence-duration term must average over REAL rows only: an
    all-masked pad row previously entered the batch mean's denominator,
    scaling lambda_sdur by real/total."""
    from diffsinger_tpu.models.losses import dur_loss

    rng = np.random.default_rng(2)
    b, t = 3, 12
    pred = jnp.asarray(rng.normal(1.0, 0.3, (b, t)).astype(np.float32))
    gt = jnp.asarray(rng.integers(1, 20, (b, t)).astype(np.float32))
    ph2word = jnp.asarray(np.tile(np.repeat(np.arange(1, 5), 3)[None], (b, 1)))
    mask = jnp.ones((b, t), jnp.float32)
    base = dur_loss(pred, gt, ph2word, mask)

    padded = dur_loss(
        jnp.concatenate([pred, jnp.zeros((1, t))]),
        jnp.concatenate([gt, jnp.zeros((1, t))]),
        jnp.concatenate([ph2word, jnp.zeros((1, t), ph2word.dtype)]),
        jnp.concatenate([mask, jnp.zeros((1, t))]),
    )
    np.testing.assert_allclose(float(base), float(padded), rtol=1e-6)


def test_sync_gradient_step_fast_forwards_schedule_count():
    """allow_optimizer_state_reset reinitializes moments (bias correction
    legitimately restarts) but the LR schedule must continue from the global
    step, not replay its warmup."""
    import optax

    from diffsinger_tpu.training.train_state import sync_gradient_step

    sched = lambda count: 0.001 * jnp.minimum(count / 100.0, 1.0)
    tx = optax.MultiSteps(
        optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched)), 4)
    st = sync_gradient_step(tx.init({"w": jnp.ones((3,))}), 500)

    found = {"schedule": [], "adam": []}

    def walk(o):
        if isinstance(o, optax.ScaleByScheduleState):
            found["schedule"].append(int(o.count))
        if isinstance(o, optax.ScaleByAdamState):
            found["adam"].append(int(o.count))
        if hasattr(o, "_fields") or isinstance(o, (tuple, list)):
            for v in o:
                walk(v)
        elif isinstance(o, dict):
            for v in o.values():
                walk(v)

    walk(st)
    assert found["schedule"] and all(c == 500 for c in found["schedule"])
    assert found["adam"] and all(c == 0 for c in found["adam"])
    assert int(st.gradient_step) == 500


def test_checkpoint_meta_carries_epoch():
    """Resume restarts the data stream at the checkpointed epoch (the sampler
    is seeded by (seed, epoch)); the epoch must round-trip through the ckpt."""
    import tempfile

    from diffsinger_tpu.utils.ckpt import load_checkpoint, save_checkpoint

    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/model_ckpt_steps_7.ckpt"
        save_checkpoint(p, {"w": np.ones((2,), np.float32)},
                        category="acoustic", global_step=7,
                        extra={"epoch": 3})
        blob = load_checkpoint(p)
        assert blob["meta"]["epoch"] == 3
        assert blob["meta"]["global_step"] == 7


def test_validation_infer_covers_enabled_conditioning():
    """Validation inference must feed every enabled conditioning embed —
    omitting spk/key_shift/speed/variances crashed the encoder at the first
    real validation of an augmented or multi-speaker config."""
    import __graft_entry__ as ge
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic, DiffSingerVariance
    from diffsinger_tpu.training.acoustic_task import encoder_kwargs_from_batch

    b, t_txt, t_mel = 2, 16, 64
    hp = dict(ge._acoustic_hparams(tiny=True),
              use_spk_id=True, num_spk=3,
              use_key_shift_embed=True, use_speed_embed=True,
              use_energy_embed=True)
    model = DiffSingerAcoustic(hp, vocab_size=62, out_dims=hp["audio_num_mel_bins"])
    params = model.init(jax.random.PRNGKey(0))
    batch = dict(ge._example_batch(b, t_txt, t_mel, hp["audio_num_mel_bins"]))
    batch["spk_ids"] = jnp.zeros((b,), jnp.int32)
    batch["key_shift"] = jnp.zeros((b, t_mel), jnp.float32)
    batch["speed"] = jnp.ones((b, t_mel), jnp.float32)
    batch["energy"] = jnp.full((b, t_mel), -40.0, jnp.float32)
    kwargs = encoder_kwargs_from_batch(hp, batch)
    assert set(kwargs) == {"spk_embed_id", "key_shift", "speed", "variances"}
    out = model.forward_infer(
        params, jax.random.PRNGKey(1), batch["tokens"], batch["mel2ph"],
        batch["f0"], gt_mel=batch["mel"], steps=2, **kwargs)
    assert np.isfinite(np.asarray(out.diff_out)).all()

    # variance family: spk_id reaches the encoder (was omitted -> Embedding(None))
    hp_v = dict(ge._variance_hparams(), use_spk_id=True, num_spk=3)
    vmodel = DiffSingerVariance(hp_v, vocab_size=62)
    vparams = vmodel.init(jax.random.PRNGKey(0))
    vb = {k: np.asarray(v) for k, v in ge._variance_batch(b, t_txt, t_mel).items()}
    dur_pred, pitch_pred, _ = vmodel.forward_infer(
        vparams, jax.random.PRNGKey(1), jnp.asarray(vb["tokens"]),
        jnp.asarray(vb["midi"]), jnp.asarray(vb["ph2word"]),
        jnp.asarray(vb["base_pitch"]),
        ph_dur=jnp.asarray(vb["ph_dur"]), mel2ph=jnp.asarray(vb["mel2ph"]),
        spk_id=jnp.zeros((b,), jnp.int32), steps=2)
    assert pitch_pred is not None and np.isfinite(np.asarray(pitch_pred)).all()
