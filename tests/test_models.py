"""Model tests (SURVEY.md §4.2): forward shapes in train/eval mode, loss
finiteness, one-step learning on a memorized batch, WaveNet fast-vs-slow
generation equivalence, receptive-field math, attention mechanisms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nspeech_tpu.config import load_config
from nspeech_tpu.models import create_model
from nspeech_tpu.models.wavenet import WaveNet, calculate_receptive_field


def tiny_taco1():
    cfg = load_config("taco1")
    cfg.parse("encoder_cbhg_banks=3,post_cbhg_banks=3,max_iters=4,"
              "attention_dim=32,decoder_dim=32,embedding_dim=32")
    cfg.encoder_prenet = [32, 16]
    # CBHG residual add requires the last projection size == its input dim.
    cfg.encoder_cbhg_bank_sizes = [32, 16]
    cfg.post_cbhg_bank_sizes = [32]
    return cfg


def tiny_taco2():
    cfg = load_config("taco2")
    cfg.parse(
        "max_iters=4,encoder_conv_layers=2,postnet_conv_layers=2,"
        "expand_conv_layers=2,encoder_conv_channels=32,attention_dim=32,"
        "postnet_conv_channels=32,expand_conv_channels=32,"
        "decoder_lstm_units=48,encoder_lstm_units=24,expand_lstm_units=24,"
        "embedding_dim=32")
    return cfg


def tiny_wavenet():
    cfg = load_config("wavenet")
    cfg.parse("dilations_length=3,dilations_depth=2,residual_channels=8,"
              "dilation_channels=8,skip_channels=16,quantization_channels=64,"
              "batch_size=2")
    return cfg


def make_batch(rng, n=2, t_in=12, t_out=20, num_freq=1025, num_mels=80):
    text = jnp.array(rng.integers(2, 60, (n, t_in)), jnp.int32)
    lengths = jnp.array([t_in, t_in - 4], jnp.int32)
    mel = jnp.array(rng.random((n, t_out, num_mels)), jnp.float32)
    lin = jnp.array(rng.random((n, t_out, num_freq)), jnp.float32)
    return text, lengths, mel, lin


@pytest.mark.parametrize("name,make_cfg", [("taco1", tiny_taco1), ("taco2", tiny_taco2)])
def test_tacotron_shapes_and_loss(name, make_cfg, rng):
    cfg = make_cfg()
    model = create_model(name, cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    text, lengths, mel, lin = make_batch(rng)

    out, new_state = model.forward(params, state, text, lengths,
                                   mel_targets=mel, is_training=True,
                                   rng=jax.random.PRNGKey(1))
    assert out["mel_outputs"].shape == mel.shape
    assert out["linear_outputs"].shape == lin.shape
    assert out["alignments"].shape == (2, 12, 20 // cfg.outputs_per_step)
    loss, metrics = model.loss(out, mel, lin)
    assert np.isfinite(float(loss))
    assert float(metrics["loss_mel"]) > 0
    # BN state must have been updated in training mode
    flat_old = jax.tree_util.tree_leaves(state)
    flat_new = jax.tree_util.tree_leaves(new_state)
    assert any(not np.allclose(a, b) for a, b in zip(flat_old, flat_new))

    # eval mode: autoregressive to max_iters
    out_e, state_e = model.forward(params, state, text, lengths, is_training=False)
    r = cfg.outputs_per_step
    assert out_e["mel_outputs"].shape == (2, cfg.max_iters * r, 80)
    assert out_e["linear_outputs"].shape == (2, cfg.max_iters * r, 1025)
    # eval mode must not change BN state
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(state_e)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("name,make_cfg", [("taco1", tiny_taco1), ("taco2", tiny_taco2)])
def test_tacotron_learns_memorized_batch(name, make_cfg, rng):
    """A few Adam steps on one batch must reduce the loss."""
    import optax

    cfg = make_cfg()
    model = create_model(name, cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    text, lengths, mel, lin = make_batch(rng)

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, state, opt_state, key):
        def loss_fn(p):
            out, ns = model.forward(p, state, text, lengths, mel_targets=mel,
                                    is_training=True, rng=key)
            loss, _ = model.loss(out, mel, lin)
            return loss, ns

        (loss, ns), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, ns, opt_state, loss

    key = jax.random.PRNGKey(7)
    losses = []
    for i in range(5):
        key, sub = jax.random.split(key)
        params, state, opt_state, loss = train_step(params, state, opt_state, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(l) for l in losses)


def test_attention_mask_and_normalization(rng):
    cfg = tiny_taco2()
    model = create_model("taco2", cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    text, lengths, mel, lin = make_batch(rng)
    out, _ = model.forward(params, state, text, lengths, mel_targets=mel,
                           is_training=True, rng=jax.random.PRNGKey(1))
    a = np.asarray(out["alignments"])  # [N, T_in, S]
    np.testing.assert_allclose(a.sum(axis=1), 1.0, atol=1e-5)
    assert a[1, int(lengths[1]):, :].max() == 0.0  # masked past length


@pytest.mark.parametrize("att", ["bah", "bah_norm", "luong", "luong_scaled",
                                 "bah_mon", "location_sensitive"])
def test_all_attention_types_run(att, rng):
    cfg = tiny_taco1()
    cfg.attention_type = att
    model = create_model("taco1", cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    text, lengths, mel, lin = make_batch(rng)
    out, _ = model.forward(params, state, text, lengths, mel_targets=mel,
                           is_training=True, rng=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out["mel_outputs"])).all()
    a = np.asarray(out["alignments"])
    assert np.isfinite(a).all() and a.min() >= 0.0


def test_location_attention_matches_conv_dense(rng):
    """The fused stacked-slice matmul inside attention_step must equal the
    reference formulation it replaces: SAME-padded Conv1D(7,1->20) of the
    previous alignments followed by Dense(20->U), added into the energy."""
    from nspeech_tpu.models import attention as att_mod
    from nspeech_tpu.ops.layers import conv1d, dense

    n, t_in, u, d = 3, 23, 16, 16
    params = att_mod.init_attention(jax.random.PRNGKey(0),
                                    "location_sensitive", num_units=u,
                                    memory_dim=d, query_dim=u)
    prev = jnp.asarray(rng.random((n, t_in)), jnp.float32)
    prev = prev / prev.sum(axis=1, keepdims=True)
    query = jnp.asarray(rng.standard_normal((n, u)), jnp.float32)
    values = jnp.asarray(rng.standard_normal((n, t_in, d)), jnp.float32)
    keys = att_mod.prepare_memory(params, values)
    mask = jnp.arange(t_in)[None, :] < jnp.asarray([23, 17, 9])[:, None]

    ctx, aln = att_mod.attention_step(params, "location_sensitive", query,
                                      prev, keys, values, mask)

    # independent oracle: conv1d -> dense -> bahdanau energy
    f = conv1d(params["location_conv"], prev[:, :, None])
    loc = dense(params["location_layer"], f)
    q = dense(params["query_layer"], query)[:, None, :]
    score = jnp.einsum("u,ntu->nt", params["v"], jnp.tanh(keys + q + loc))
    aln_ref = jax.nn.softmax(jnp.where(mask, score, -jnp.inf), axis=-1)
    ctx_ref = jnp.einsum("nt,ntd->nd", aln_ref, values)

    np.testing.assert_allclose(np.asarray(aln), np.asarray(aln_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_ref),
                               atol=1e-5, rtol=1e-5)


def test_receptive_field_formula():
    # reference formula (wavenet.py:126-134): (fw-1)*sum(dil)+1 + (fw-1)
    dil = [2 ** i for i in range(10)] * 5
    assert calculate_receptive_field(2, dil, False, 32) == 5117
    assert calculate_receptive_field(2, [1, 2, 4], False, 32) == 9
    assert calculate_receptive_field(2, [1], True, 32) == 33


def test_wavenet_train_shapes_and_initial_loss(rng):
    cfg = tiny_wavenet()
    net = WaveNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    T = net.receptive_field + 10
    audio = jnp.array(rng.uniform(-0.8, 0.8, (2, T)), jnp.float32)
    logits, targets = net.forward_train(params, audio)
    assert logits.shape == (2, 10, 64)
    assert targets.shape == (2, 10)
    loss, _ = net.loss(logits, targets)
    # Xavier-initialized net starts near the uniform distribution.
    assert abs(float(loss) - np.log(64)) < 0.5


def test_wavenet_train_path_matches_onehot_network(rng):
    """forward_train's embedded-gather input path (the initial causal conv
    computed as embedding lookups, wavenet.py:_network_embedded) must be
    numerically identical to the one-hot conv network used by
    predict_logits — same kernel, two formulations."""
    from nspeech_tpu.dsp.mulaw import mu_law_encode

    cfg = tiny_wavenet()
    cfg.parse("gc_channels=4,gc_category_cardinality=3,lc_channels=5")
    net = WaveNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    T = net.receptive_field + 8
    audio = jnp.array(rng.uniform(-0.8, 0.8, (2, T)), jnp.float32)
    gc_ids = jnp.array([1, 2], jnp.int32)
    lc = jnp.array(rng.random((2, T, 5)), jnp.float32)

    logits_tr, targets = net.forward_train(params, audio, gc_ids=gc_ids,
                                           lc=lc)
    codes = mu_law_encode(audio, cfg.quantization_channels)
    logits_oh = net.predict_logits(params, codes[:, :-1], gc_ids=gc_ids,
                                   lc=lc[:, :-1, :])
    np.testing.assert_allclose(np.asarray(logits_tr),
                               np.asarray(logits_oh), atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(targets),
                                  np.asarray(codes[:, net.receptive_field:]))


def test_wavenet_learns(rng):
    import optax

    cfg = tiny_wavenet()
    net = WaveNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    T = net.receptive_field + 32
    t = np.arange(T) / 64.0
    audio = jnp.array(np.tile(0.5 * np.sin(2 * np.pi * t), (2, 1)), jnp.float32)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits, targets = net.forward_train(p, audio)
            return net.loss(logits, targets)[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_wavenet_fast_slow_equivalence(rng):
    """The single-dispatch scan generator must emit the same logits as the
    full-window network — the property the reference never verified
    (SURVEY.md §4.2)."""
    cfg = tiny_wavenet()
    net = WaveNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    RF = net.receptive_field
    N, T = 2, RF + 6
    codes = jnp.array(rng.integers(0, 64, (N, T)), jnp.int32)
    slow = np.asarray(net.predict_logits(params, codes))
    _, fast = net.generate(params, n_samples=1, key=jax.random.PRNGKey(3),
                           batch=N, seed_codes=codes, return_logits=True,
                           include_prime=True)
    fast = np.asarray(fast)
    for t in range(RF - 1, T):
        np.testing.assert_allclose(fast[:, t], slow[:, t - RF + 1],
                                   atol=2e-4, rtol=1e-4)


def test_wavenet_conditioned_equivalence(rng):
    """gc+lc conditioned fast generation matches the conditioned network."""
    cfg = tiny_wavenet()
    cfg.parse("gc_channels=4,gc_category_cardinality=3,lc_channels=5")
    net = WaveNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    RF = net.receptive_field
    N, T = 2, RF + 4
    codes = jnp.array(rng.integers(0, 64, (N, T)), jnp.int32)
    gc_ids = jnp.array([0, 2], jnp.int32)
    lc = jnp.array(rng.random((N, T + 1, 5)), jnp.float32)
    slow = np.asarray(net.predict_logits(params, codes, gc_ids=gc_ids,
                                         lc=lc[:, :T, :]))
    _, fast = net.generate(params, n_samples=1, key=jax.random.PRNGKey(3),
                           batch=N, gc_ids=gc_ids, lc=lc,
                           seed_codes=codes, return_logits=True,
                           include_prime=True)
    fast = np.asarray(fast)
    for t in range(RF - 1, T):
        np.testing.assert_allclose(fast[:, t], slow[:, t - RF + 1],
                                   atol=2e-4, rtol=1e-4)


def test_wavenet_generate_sampling(rng):
    cfg = tiny_wavenet()
    net = WaveNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    samples = np.asarray(net.generate(params, n_samples=50,
                                      key=jax.random.PRNGKey(5), batch=2))
    assert samples.shape == (2, 50)
    assert samples.min() >= 0 and samples.max() < 64
    # Temperature ~0 behaves like argmax: deterministic across keys.
    s1 = np.asarray(net.generate(params, 20, jax.random.PRNGKey(1), batch=1,
                                 temperature=1e-4))
    s2 = np.asarray(net.generate(params, 20, jax.random.PRNGKey(2), batch=1,
                                 temperature=1e-4))
    np.testing.assert_array_equal(s1, s2)


def test_simple_wavenet_registry():
    cfg = load_config("simple_wavenet")
    cfg.parse("dilations_length=2,dilations_depth=1")
    net = create_model("simple_wavenet", cfg)
    assert isinstance(net, WaveNet)
    assert net.receptive_field == calculate_receptive_field(2, [1, 2], False, 32)


def test_wavenet_priming_offset(rng):
    """The first returned free-running sample must be the prediction
    conditioned on the full seed (emitted at scan step prime_len-1), and
    exactly n_samples must come back."""
    cfg = tiny_wavenet()
    net = WaveNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    RF = net.receptive_field
    codes = jnp.array(rng.integers(0, 64, (1, RF + 3)), jnp.int32)
    prime_len = codes.shape[1]
    n = 5
    full, full_logits = net.generate(
        params, n_samples=n, key=jax.random.PRNGKey(7), batch=1,
        seed_codes=codes, return_logits=True, include_prime=True)
    out, out_logits = net.generate(
        params, n_samples=n, key=jax.random.PRNGKey(7), batch=1,
        seed_codes=codes, return_logits=True)
    assert out.shape == (1, n)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(full[:, prime_len - 1: prime_len - 1 + n]))
    # The first free logits equal the slow network's prediction after the seed.
    slow = np.asarray(net.predict_logits(params, codes))
    np.testing.assert_allclose(np.asarray(out_logits[:, 0]), slow[:, -1],
                               atol=2e-4, rtol=1e-4)


@pytest.mark.smoke
def test_autoregressive_decode_stops_early():
    """The while_loop decoder stops at the zero-frame stop token, reports
    per-row lengths, and leaves post-stop frames zero (dynamic_decode
    zero-padding semantics)."""
    from nspeech_tpu.models import decoder as D

    num_mels, r, batch, max_iters = 3, 2, 2, 10
    stop_at = jnp.array([4, 6])  # row 0 stops at step 4, row 1 at step 6

    def step(carry, x, _rng):
        t = carry
        out = jnp.where((t + 1 >= stop_at)[:, None],
                        0.0, jnp.full((batch, r * num_mels), 0.5 + t))
        align = jnp.ones((batch, 5)) / 5.0
        return t + 1, (out, align)

    outs, aligns, steps = jax.jit(lambda c: D.scan_autoregressive(
        step, c, batch, num_mels, r, max_iters))(jnp.zeros((), jnp.int32))
    assert outs.shape == (max_iters, batch, r * num_mels)
    np.testing.assert_array_equal(np.asarray(steps), [4, 6])
    # frames past the LAST stop are zero (loop exited)
    assert np.all(np.asarray(outs[6:]) == 0.0)
    # pre-stop frames are the live values
    assert np.all(np.asarray(outs[0, :, 0]) == 0.5)
    # row 0 finished at step 4: its frames at steps 4-5 (while row 1 was
    # still decoding) are zeroed per-row, not free-running
    assert np.all(np.asarray(outs[4:6, 0]) == 0.0)


@pytest.mark.smoke
def test_autoregressive_stop_threshold():
    """A near-zero (but not exactly zero) frame stops decode when
    stop_threshold is set, and does NOT stop it at the default 0.0 (the
    reference's exact-zero end-token quirk, helpers.py:35)."""
    from nspeech_tpu.models import decoder as D

    num_mels, r, batch, max_iters = 3, 2, 2, 8

    def step(carry, x, _rng):
        t = carry
        # after step 3 both rows emit tiny values (|x| = 0.01), never 0.0
        out = jnp.where(t + 1 >= 3, 0.01, 0.7) * jnp.ones((batch, r * num_mels))
        align = jnp.ones((batch, 5)) / 5.0
        return t + 1, (out, align)

    run = lambda thresh: jax.jit(lambda c: D.scan_autoregressive(
        step, c, batch, num_mels, r, max_iters,
        stop_threshold=thresh))(jnp.zeros((), jnp.int32))

    _, _, steps_exact = run(0.0)
    np.testing.assert_array_equal(np.asarray(steps_exact), [max_iters] * batch)

    outs, _, steps = run(0.02)
    np.testing.assert_array_equal(np.asarray(steps), [3, 3])
    assert np.all(np.asarray(outs[3:]) == 0.0)


@pytest.mark.smoke
def test_autoregressive_initial_finished_rows():
    """Rows marked finished at t=0 (batch-padding rows) emit only zeros,
    report 0 decoded steps, and never extend the batch's while_loop."""
    from nspeech_tpu.models import decoder as D

    num_mels, r, batch, max_iters = 2, 1, 3, 12
    stop_at = jnp.array([5, 9, 2])  # row 2's own stop would be step 2

    def step(carry, x, _rng):
        t = carry
        out = jnp.where((t + 1 >= stop_at)[:, None],
                        0.0, jnp.full((batch, r * num_mels), 1.0))
        align = jnp.ones((batch, 4)) / 4.0
        return t + 1, (out, align)

    init_fin = jnp.array([False, False, True])  # row 2 is a padding row
    outs, _, steps = jax.jit(lambda c: D.scan_autoregressive(
        step, c, batch, num_mels, r, max_iters,
        initial_finished=init_fin))(jnp.zeros((), jnp.int32))
    np.testing.assert_array_equal(np.asarray(steps), [5, 9, 0])
    assert np.all(np.asarray(outs[:, 2]) == 0.0)   # padding row all zero
    assert np.all(np.asarray(outs[9:]) == 0.0)     # loop exited at 9


def test_synthesize_batch_padding_rows_stop_at_zero():
    """End-to-end: a batch padded to a power of two decodes only as long as
    its real rows need — padding rows start finished (length 0)."""
    from nspeech_tpu.serving.synthesizer import Synthesizer

    cfg = tiny_taco2()
    cfg.max_iters = 6
    model = create_model("taco2", cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    synth = Synthesizer(cfg, text_bucket=16)
    synth.set_variables(params, state, model=model)
    # 3 texts pad the batch to 4; the padding row must not prevent the
    # while_loop from exiting once the 3 real rows stop (an untrained model
    # never emits zeros, so every REAL row runs to max_iters — this test
    # asserts shapes + no NaNs from the masked length-0 row).
    wavs, mels, lins = synth.synthesize_batch(["ab", "abcd", "a"])
    assert len(wavs) == 3
    assert np.isfinite(np.asarray(mels)).all()
    assert np.isfinite(np.asarray(lins)).all()
    for w in wavs:
        assert np.isfinite(w).all()


@pytest.mark.smoke
def test_guided_attention_penalty_prefers_diagonal():
    from nspeech_tpu.models.decoder import guided_attention_penalty

    n, t_in, s = 1, 8, 8
    lengths = jnp.array([8])
    steps = jnp.array([8])
    diag = jnp.eye(t_in)[None]                       # perfect alignment
    anti = jnp.eye(t_in)[:, ::-1][None]              # worst case
    unif = jnp.full((n, t_in, s), 1.0 / t_in)
    p_diag = float(guided_attention_penalty(diag, lengths, steps, 0.2))
    p_unif = float(guided_attention_penalty(unif, lengths, steps, 0.2))
    p_anti = float(guided_attention_penalty(anti, lengths, steps, 0.2))
    assert p_diag < p_unif < p_anti
    # masked cells contribute nothing: padding rows/steps change nothing
    pad = jnp.pad(diag, ((0, 0), (0, 4), (0, 4)))
    p_pad = float(guided_attention_penalty(pad, lengths, steps, 0.2))
    np.testing.assert_allclose(p_pad, p_diag, rtol=1e-6)


def test_guided_attention_weight_trains(rng):
    """With guided_attention_weight > 0 the train metrics expose the
    penalty and one step decreases it."""
    from nspeech_tpu.data.feeder import Batch
    from nspeech_tpu.train import create_state, make_optimizer
    from nspeech_tpu.train.loop import build_tacotron_train_step

    cfg = tiny_taco2()
    cfg.guided_attention_weight = 10.0
    cfg.batch_size = 2
    model = create_model("taco2", cfg)
    tx, _ = make_optimizer(cfg, "taco2")
    step_fn = build_tacotron_train_step(model, tx)
    state = create_state(model, tx, jax.random.PRNGKey(0))
    batch = Batch(
        inputs=jnp.asarray(rng.integers(2, 40, (2, 12)), jnp.int32),
        input_lengths=jnp.asarray([12, 9], jnp.int32),
        speaker_ids=jnp.zeros((2,), jnp.int32),
        mel_targets=jnp.asarray(rng.random((2, 20, cfg.num_mels)), jnp.float32),
        linear_targets=jnp.asarray(rng.random((2, 20, cfg.num_freq)), jnp.float32),
        audio=jnp.zeros((2, 4), jnp.float32),
    )
    losses = []
    for i in range(3):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        assert "loss_guided_attention" in metrics
        losses.append(float(metrics["loss_guided_attention"]))
    assert losses[-1] < losses[0]


def test_attention_window_constrains_eval_decode():
    """attention_win_fwd > 0 (serving-only): each autoregressive step's
    attention argmax stays within [p-back, p+fwd] of the previous step's
    — a random-init model's attention normally jumps all over the text,
    so the constraint holding step-for-step proves the window is live;
    training mode must remain unwindowed."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nspeech_tpu.config import load_config
    from nspeech_tpu.models import create_model

    cfg = load_config("taco2")
    cfg.parse(
        "max_iters=12,outputs_per_step=2,encoder_conv_layers=1,"
        "postnet_conv_layers=1,expand_conv_layers=1,"
        "encoder_conv_channels=16,attention_dim=16,postnet_conv_channels=16,"
        "expand_conv_channels=16,decoder_lstm_units=16,encoder_lstm_units=8,"
        "expand_lstm_units=8,embedding_dim=16,"
        "attention_win_fwd=2,attention_win_back=1")
    model = create_model("taco2", cfg)
    params, bn = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, 40, (1, 24)), jnp.int32)
    lengths = jnp.asarray([24], jnp.int32)

    outputs, _ = model.forward(params, bn, ids, lengths,
                               speaker_ids=jnp.zeros((1,), jnp.int32),
                               is_training=False)
    align = np.asarray(outputs["alignments"])[0]     # [T_in, S]
    path = np.argmax(align, axis=0)
    deltas = np.diff(path)
    assert (deltas >= -1).all() and (deltas <= 2).all(), path

    # control: without the window the same random model jumps
    cfg2 = load_config("taco2")
    cfg2.parse(
        "max_iters=12,outputs_per_step=2,encoder_conv_layers=1,"
        "postnet_conv_layers=1,expand_conv_layers=1,"
        "encoder_conv_channels=16,attention_dim=16,postnet_conv_channels=16,"
        "expand_conv_channels=16,decoder_lstm_units=16,encoder_lstm_units=8,"
        "expand_lstm_units=8,embedding_dim=16")
    model2 = create_model("taco2", cfg2)
    out2, _ = model2.forward(params, bn, ids, lengths,
                             speaker_ids=jnp.zeros((1,), jnp.int32),
                             is_training=False)
    path2 = np.argmax(np.asarray(out2["alignments"])[0], axis=0)
    # the unwindowed model attends straight to an interior position at
    # step 0; the window (anchored at the all-zero initial alignments'
    # argmax 0) forbids that — proof the masking is live at eval
    assert path2[0] > 2, path2
    assert path[0] <= 2, path
