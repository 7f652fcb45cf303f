"""TF1-compat shim: rebuild the ``tf.layers`` / ``tf.contrib`` surface the
reference Tacotron models need, on top of ``tf.compat.v1`` in TF 2.x.

TF 2.21 (this image) has removed the Keras-legacy ``tf.compat.v1.layers``
and ``tf.compat.v1.nn.rnn_cell`` along with all of ``tf.contrib`` — so the
reference's Tacotron graphs (reference: neural_speech/models/tacotron.py,
tacotron2.py — built from contrib.rnn cells, contrib.seq2seq attention
wrappers and ``dynamic_decode``) cannot be constructed as-is. This module
recreates exactly the pieces those files touch, with two fidelity goals:

1. **Math**: each op reproduces the TF 1.15 implementation's semantics
   (GRUCell gate order and bias-1.0 init, LSTMBlockCell's fused i/j/f/o
   kernel with runtime forget bias, Bahdanau energies, AttentionWrapper's
   input-feeding and state threading, dynamic_decode's helper loop,
   bidirectional_dynamic_rnn's masking) so a parity assertion against the
   reference code built on this shim is an assertion against the
   reference's numerical behavior.
2. **Checkpoint names**: variables are created under the same
   scope-naming discipline TF 1.x used (functional layers uniquify a
   ``default_name`` per enclosing scope; RNN cells pin a snake-cased class
   scope at first call; ``MultiRNNCell`` wraps sub-cells in ``cell_%d``;
   attention internals live under ``bahdanau_attention`` /
   ``location_sensitive_attention`` with ``attention_v`` etc.), so a
   ``tf.train.Saver`` checkpoint saved from the shim-built graph carries
   the same variable-name structure a genuine TF1 reference checkpoint
   does. The wrapper-scope middle of decoder paths is the one area where
   TF1's auto-generated nesting is hard to reproduce with certainty from
   spec; the importer (nspeech_tpu/migrate/tacotron.py) therefore matches
   on the structural landmarks (explicit scopes the reference sets itself
   + leaf names TF1 hardcodes) and is insensitive to that middle.

The unrolled-graph difference from TF1: TF1 traces RNN step bodies ONCE
inside ``tf.while_loop``; this shim unrolls decoding in Python, so every
step re-executes the reference's layer-building code. Reuse is handled by
(a) cells/object-layers capturing their variables at first call and (b) a
per-graph call-site registry for functional layers and
``variable_scope(None, default_name)`` — the t-th execution of a given
source line resolves to the scope its first execution created, which is
exactly the one-trace TF1 outcome.
"""

from __future__ import annotations

import contextlib
import re
import sys
import types

import numpy as np
import tensorflow as _tf

v1 = _tf.compat.v1


# ---------------------------------------------------------------------------
# Scope sites: capture-once variable scopes
# ---------------------------------------------------------------------------

def _graph_registry():
    g = v1.get_default_graph()
    reg = getattr(g, "_tf1shim_sites", None)
    if reg is None:
        reg = {}
        g._tf1shim_sites = reg
    return reg


def _caller_loc(skip_file: str):
    """(filename, lineno) of the nearest frame outside ``skip_file`` —
    the stable identity of a functional-layer call site."""
    f = sys._getframe(2)
    while f is not None and f.f_code.co_filename == skip_file:
        f = f.f_back
    if f is None:  # pragma: no cover - defensive
        return ("<unknown>", 0)
    return (f.f_code.co_filename, f.f_lineno)


class _ScopeSite:
    """A variable scope that uniquifies on first entry and is re-entered
    exactly (same absolute path, AUTO_REUSE) afterwards."""

    def __init__(self, name=None, default_name=None):
        self._name = name
        self._default = default_name
        self._scope = None

    @contextlib.contextmanager
    def enter(self):
        if self._scope is None:
            # A fresh (possibly default_name-uniquified) scope can't take
            # reuse=AUTO_REUSE without a name; it has nothing to reuse yet.
            kw = {"reuse": v1.AUTO_REUSE} if self._name is not None else {}
            with v1.variable_scope(
                    self._name, default_name=self._default, **kw) as s:
                self._scope = s
                yield s
        else:
            with v1.variable_scope(self._scope, reuse=v1.AUTO_REUSE,
                                   auxiliary_name_scope=False) as s:
                yield s


def _site(default_name, explicit_name=None):
    """Resolve the scope site for a functional-layer call. Explicit names
    key on (enclosing scope, name); unnamed layers key on the caller's
    source location so the t-th re-execution of a line reuses the scope
    its first execution created (TF1's one-trace semantics)."""
    enclosing = v1.get_variable_scope().name
    if explicit_name is not None:
        key = (enclosing, explicit_name)
    else:
        key = (enclosing, default_name) + _caller_loc(__file__)
    reg = _graph_registry()
    if key not in reg:
        reg[key] = _ScopeSite(name=explicit_name, default_name=default_name)
    return reg[key]


def shim_variable_scope(name_or_scope, default_name=None, values=None, **kw):
    """Drop-in for ``tf.variable_scope`` under Python-unrolled decoding:
    ``(None, default_name)`` calls dedupe per call site (TF1 uniquified
    them once, at trace time); everything else passes through with
    AUTO_REUSE so re-executed reference code reuses its variables."""
    del values
    if name_or_scope is None:
        return _site(default_name).enter()
    kw.pop("reuse", None)
    return v1.variable_scope(name_or_scope, reuse=v1.AUTO_REUSE, **kw)


# ---------------------------------------------------------------------------
# tf.layers functional API (TF1 names: dense/kernel, conv1d/kernel,
# batch_normalization/{gamma,beta,moving_mean,moving_variance})
# ---------------------------------------------------------------------------

def _glorot():
    return v1.glorot_uniform_initializer()


def dense(inputs, units, activation=None, use_bias=True,
          bias_initializer=None, name=None, **_ignored):
    units = int(units)
    in_dim = int(inputs.shape[-1])
    with _site("dense", name).enter():
        kernel = v1.get_variable("kernel", [in_dim, units],
                                 initializer=_glorot())
        bias = (v1.get_variable("bias", [units],
                                initializer=bias_initializer
                                or v1.zeros_initializer())
                if use_bias else None)
    y = _tf.tensordot(inputs, kernel, [[inputs.shape.ndims - 1], [0]])
    if bias is not None:
        y = y + bias
    return activation(y) if activation is not None else y


def conv1d(inputs, filters, kernel_size, padding="valid", activation=None,
           use_bias=True, name=None, **_ignored):
    in_ch = int(inputs.shape[-1])
    with _site("conv1d", name).enter():
        kernel = v1.get_variable("kernel",
                                 [int(kernel_size), in_ch, int(filters)],
                                 initializer=_glorot())
        bias = (v1.get_variable("bias", [int(filters)],
                                initializer=v1.zeros_initializer())
                if use_bias else None)
    y = _tf.nn.conv1d(inputs, kernel, stride=1, padding=padding.upper())
    if bias is not None:
        y = y + bias
    return activation(y) if activation is not None else y


def batch_normalization(inputs, training=False, momentum=0.99,
                        epsilon=1e-3, name=None, **_ignored):
    dim = int(inputs.shape[-1])
    with _site("batch_normalization", name).enter():
        gamma = v1.get_variable("gamma", [dim],
                                initializer=v1.ones_initializer())
        beta = v1.get_variable("beta", [dim],
                               initializer=v1.zeros_initializer())
        moving_mean = v1.get_variable(
            "moving_mean", [dim], initializer=v1.zeros_initializer(),
            trainable=False)
        moving_var = v1.get_variable(
            "moving_variance", [dim], initializer=v1.ones_initializer(),
            trainable=False)
    if training:
        axes = list(range(inputs.shape.ndims - 1))
        mean, var = _tf.nn.moments(inputs, axes)
    else:
        mean, var = moving_mean, moving_var
    return _tf.nn.batch_normalization(inputs, mean, var, beta, gamma,
                                      epsilon)


def dropout(inputs, rate=0.5, training=False, name=None, **_ignored):
    # tf.layers.dropout defaults training=False — the reference's prenet
    # relies on exactly this no-op (it never passes training=...).
    if not training:
        return inputs
    return _tf.nn.dropout(inputs, rate=rate)


def max_pooling1d(inputs, pool_size, strides, padding="valid",
                  name=None, **_ignored):
    x = _tf.expand_dims(inputs, 1)
    y = _tf.nn.max_pool2d(x, [1, 1, int(pool_size), 1],
                          [1, 1, int(strides), 1], padding.upper())
    return _tf.squeeze(y, 1)


class Dense:
    """Object form (tf.layers.Dense): used by attention mechanisms for
    memory_layer / query_layer / location_layer."""

    def __init__(self, units, activation=None, use_bias=True, name=None,
                 dtype=None, **_ignored):
        self.units = int(units)
        self.activation = activation
        self.use_bias = use_bias
        self._site = None
        self._name = name
        self.dtype = dtype or _tf.float32
        self.kernel = None
        self.bias = None

    def __call__(self, x):
        if self._site is None:
            self._site = _ScopeSite(name=self._name, default_name="dense")
        with self._site.enter():
            if self.kernel is None:
                self.kernel = v1.get_variable(
                    "kernel", [int(x.shape[-1]), self.units],
                    initializer=_glorot())
                if self.use_bias:
                    self.bias = v1.get_variable(
                        "bias", [self.units],
                        initializer=v1.zeros_initializer())
        y = _tf.tensordot(x, self.kernel, [[x.shape.ndims - 1], [0]])
        if self.bias is not None:
            y = y + self.bias
        return self.activation(y) if self.activation else y


class Conv1D:
    """Object form (tf.layers.Conv1D): LocationSensitiveAttention's
    location_conv."""

    def __init__(self, filters, kernel_size, padding="valid", use_bias=True,
                 name=None, **_ignored):
        self.filters = int(filters)
        self.kernel_size = int(kernel_size)
        self.padding = padding.upper()
        self.use_bias = use_bias
        self._name = name
        self._site = None
        self.kernel = None
        self.bias = None

    def __call__(self, x):
        if self._site is None:
            self._site = _ScopeSite(name=self._name, default_name="conv1d")
        with self._site.enter():
            if self.kernel is None:
                self.kernel = v1.get_variable(
                    "kernel",
                    [self.kernel_size, int(x.shape[-1]), self.filters],
                    initializer=_glorot())
                if self.use_bias:
                    self.bias = v1.get_variable(
                        "bias", [self.filters],
                        initializer=v1.zeros_initializer())
        y = _tf.nn.conv1d(x, self.kernel, stride=1, padding=self.padding)
        if self.bias is not None:
            y = y + self.bias
        return y


layers = types.SimpleNamespace(
    dense=dense, conv1d=conv1d, batch_normalization=batch_normalization,
    dropout=dropout, max_pooling1d=max_pooling1d, Dense=Dense,
    Conv1D=Conv1D)


# ---------------------------------------------------------------------------
# contrib.rnn: RNNCell base + GRUCell / LSTMBlockCell / wrappers
# (TF 1.15 rnn_cell_impl.py + contrib lstm_ops.py semantics)
# ---------------------------------------------------------------------------

def _snake(cls_name: str) -> str:
    # Acronym-aware (TF1 generic_utils.to_snake_case): GRUCell ->
    # gru_cell, LSTMBlockCell -> lstm_block_cell.
    s = re.sub(r"([A-Z]+)([A-Z][a-z])", r"\1_\2", cls_name)
    s = re.sub(r"([a-z\d])([A-Z])", r"\1_\2", s)
    return s.lower()


class LSTMStateTuple(tuple):
    """(c, h) state pair with named access, as TF1's namedtuple."""

    def __new__(cls, c, h):
        return super().__new__(cls, (c, h))

    @property
    def c(self):
        return self[0]

    @property
    def h(self):
        return self[1]


class RNNCell:
    """Duck-typed RNNCell: scope pinned at first call (snake-cased class
    name, like TF1 LayerRNNCell), variables owned by the instance."""

    def __init__(self, *a, **k):
        self._shim_site = None

    def _enter(self):
        if self._shim_site is None:
            self._shim_site = _ScopeSite(default_name=_snake(type(self).__name__))
        return self._shim_site.enter()

    def __call__(self, inputs, state, scope=None):
        with self._enter():
            return self.call(inputs, state)

    # subclasses define: call, state_size, output_size
    def zero_state(self, batch_size, dtype):
        def z(size):
            if isinstance(size, LSTMStateTuple):
                return LSTMStateTuple(z(size.c), z(size.h))
            if isinstance(size, tuple):
                return tuple(z(s) for s in size)
            return _tf.zeros(_tf.stack([batch_size, size]), dtype)

        return z(self.state_size)


class GRUCell(RNNCell):
    """TF1 GRUCell: gates kernel [in+u, 2u] (bias init 1.0), candidate
    over [x, r*h] (bias 0); new_h = u*h + (1-u)*tanh(c)."""

    def __init__(self, num_units, **kw):
        super().__init__()
        self._units = int(num_units)
        self._built = False

    @property
    def state_size(self):
        return self._units

    @property
    def output_size(self):
        return self._units

    def call(self, x, h):
        u = self._units
        in_dim = int(x.shape[-1])
        if not self._built:
            self._gk = v1.get_variable("gates/kernel", [in_dim + u, 2 * u],
                                       initializer=_glorot())
            self._gb = v1.get_variable(
                "gates/bias", [2 * u],
                initializer=v1.constant_initializer(1.0))
            self._ck = v1.get_variable("candidate/kernel", [in_dim + u, u],
                                       initializer=_glorot())
            self._cb = v1.get_variable("candidate/bias", [u],
                                       initializer=v1.zeros_initializer())
            self._built = True
        gates = _tf.sigmoid(_tf.matmul(_tf.concat([x, h], 1), self._gk)
                            + self._gb)
        r, z = _tf.split(gates, 2, axis=1)
        c = _tf.tanh(_tf.matmul(_tf.concat([x, r * h], 1), self._ck)
                     + self._cb)
        new_h = z * h + (1.0 - z) * c
        return new_h, new_h


class LSTMBlockCell(RNNCell):
    """contrib.rnn.LSTMBlockCell: one fused kernel [in+u, 4u] in
    (i, j, f, o) order, bias zeros, forget_bias added at runtime."""

    def __init__(self, num_units, forget_bias=1.0, **kw):
        super().__init__()
        self._units = int(num_units)
        self._forget_bias = forget_bias
        self._built = False

    @property
    def state_size(self):
        return LSTMStateTuple(self._units, self._units)

    @property
    def output_size(self):
        return self._units

    def call(self, x, state):
        c, h = state
        u = self._units
        in_dim = int(x.shape[-1])
        if not self._built:
            self._k = v1.get_variable("kernel", [in_dim + u, 4 * u],
                                      initializer=_glorot())
            self._b = v1.get_variable("bias", [4 * u],
                                      initializer=v1.zeros_initializer())
            self._built = True
        z = _tf.matmul(_tf.concat([x, h], 1), self._k) + self._b
        i, j, f, o = _tf.split(z, 4, axis=1)
        new_c = (c * _tf.sigmoid(f + self._forget_bias)
                 + _tf.sigmoid(i) * _tf.tanh(j))
        new_h = _tf.tanh(new_c) * _tf.sigmoid(o)
        return new_h, LSTMStateTuple(new_c, new_h)


class MultiRNNCell(RNNCell):
    def __init__(self, cells, state_is_tuple=True):
        super().__init__()
        assert state_is_tuple
        self._cells = list(cells)

    @property
    def state_size(self):
        return tuple(c.state_size for c in self._cells)

    @property
    def output_size(self):
        return self._cells[-1].output_size

    def call(self, x, state):
        new_states = []
        for i, (cell, s) in enumerate(zip(self._cells, state)):
            with v1.variable_scope("cell_%d" % i, reuse=v1.AUTO_REUSE):
                x, ns = cell(x, s)
            new_states.append(ns)
        return x, tuple(new_states)

    def zero_state(self, batch_size, dtype):
        return tuple(c.zero_state(batch_size, dtype) for c in self._cells)


class OutputProjectionWrapper(RNNCell):
    """TF1 contrib wrapper: inner cell, then a lazily-built _Linear
    ('kernel'/'bias' in the wrapper's scope)."""

    def __init__(self, cell, output_size):
        super().__init__()
        self._cell = cell
        self._output_size = int(output_size)
        self._built = False

    @property
    def state_size(self):
        return self._cell.state_size

    @property
    def output_size(self):
        return self._output_size

    def call(self, x, state):
        out, new_state = self._cell(x, state)
        if not self._built:
            self._k = v1.get_variable(
                "kernel", [int(out.shape[-1]), self._output_size],
                initializer=_glorot())
            self._b = v1.get_variable("bias", [self._output_size],
                                      initializer=v1.zeros_initializer())
            self._built = True
        return _tf.matmul(out, self._k) + self._b, new_state

    def zero_state(self, batch_size, dtype):
        return self._cell.zero_state(batch_size, dtype)


class ResidualWrapper(RNNCell):
    def __init__(self, cell):
        super().__init__()
        self._cell = cell

    @property
    def state_size(self):
        return self._cell.state_size

    @property
    def output_size(self):
        return self._cell.output_size

    def call(self, x, state):
        out, new_state = self._cell(x, state)
        return x + out, new_state

    def zero_state(self, batch_size, dtype):
        return self._cell.zero_state(batch_size, dtype)


# ---------------------------------------------------------------------------
# contrib.seq2seq: attention mechanisms + AttentionWrapper + decoding
# ---------------------------------------------------------------------------

class _AlignmentHistory:
    """Stand-in for the AttentionWrapper's alignment-history TensorArray:
    an immutable list of [N, T] steps with TF1's ``.stack()``."""

    def __init__(self, steps=()):
        self._steps = tuple(steps)

    def append(self, a):
        return _AlignmentHistory(self._steps + (a,))

    def stack(self):
        return _tf.stack(self._steps)  # [S, N, T_in]


class AttentionWrapperState:
    def __init__(self, cell_state, attention, time, alignments,
                 alignment_history, attention_state):
        self.cell_state = cell_state
        self.attention = attention
        self.time = time
        self.alignments = alignments
        self.alignment_history = alignment_history
        self.attention_state = attention_state


class BahdanauAttention:
    """TF1.15 BahdanauAttention: memory_layer/query_layer Dense (no bias),
    keys built at construction from length-masked memory, score
    v . tanh(keys + query) under a 'bahdanau_attention' scope with the
    'attention_v' variable (plus attention_g/attention_b when
    normalize=True), -inf-masked softmax."""

    _score_scope = "bahdanau_attention"

    def __init__(self, num_units, memory, memory_sequence_length=None,
                 normalize=False, name=None):
        self._num_units = int(num_units)
        self._normalize = normalize
        self.memory_layer = Dense(num_units, use_bias=False,
                                  name="memory_layer")
        self.query_layer = Dense(num_units, use_bias=False,
                                 name="query_layer")
        self._memory_lengths = memory_sequence_length
        self.values = self._mask_memory(memory, memory_sequence_length)
        self.keys = self.memory_layer(self.values)
        self._site = None

    @staticmethod
    def _mask_memory(memory, lengths):
        if lengths is None:
            return memory
        mask = _tf.sequence_mask(lengths, _tf.shape(memory)[1],
                                 dtype=memory.dtype)
        return memory * mask[:, :, None]

    @property
    def alignments_size(self):
        return _tf.shape(self.keys)[1]

    @property
    def batch_size(self):
        return _tf.shape(self.keys)[0]

    def initial_alignments(self, batch_size, dtype):
        return _tf.zeros(_tf.stack([batch_size, self.alignments_size]),
                         dtype)

    initial_state = initial_alignments

    def _probability_fn(self, score, state):
        del state
        if self._memory_lengths is not None:
            mask = _tf.sequence_mask(self._memory_lengths,
                                     _tf.shape(score)[1])
            score = _tf.where(mask, score,
                              _tf.fill(_tf.shape(score), float("-inf")))
        return _tf.nn.softmax(score, axis=-1)

    def __call__(self, query, state):
        if self._site is None:
            self._site = _ScopeSite(default_name=self._score_scope)
        with self._site.enter():
            processed = self.query_layer(query)[:, None, :]
            vv = v1.get_variable("attention_v", [self._num_units])
            if self._normalize:
                g = v1.get_variable(
                    "attention_g",
                    initializer=np.float32(np.sqrt(1.0 / self._num_units)))
                b = v1.get_variable("attention_b", [self._num_units],
                                    initializer=v1.zeros_initializer())
                normed_v = g * vv * _tf.math.rsqrt(
                    _tf.reduce_sum(_tf.square(vv)))
                score = _tf.reduce_sum(
                    normed_v * _tf.tanh(self.keys + processed + b), [2])
            else:
                score = _tf.reduce_sum(
                    vv * _tf.tanh(self.keys + processed), [2])
        alignments = self._probability_fn(score, state)
        return alignments, alignments


class BahdanauMonotonicAttention(BahdanauAttention):
    """TF1.15 BahdanauMonotonicAttention, parallel mode, zero sigmoid
    noise: Bahdanau energy + trainable 'attention_score_bias', p =
    sigmoid(score), alignments via Raffel et al.'s cumprod/cumsum
    recursion; initial alignments one-hot at position 0."""

    _score_scope = "bahdanau_monotonic_attention"

    def initial_alignments(self, batch_size, dtype):
        t_in = self.alignments_size
        return _tf.one_hot(_tf.zeros((batch_size,), _tf.int32), t_in,
                           dtype=dtype)

    initial_state = initial_alignments

    def _probability_fn(self, score, previous):
        if self._memory_lengths is not None:
            mask = _tf.sequence_mask(self._memory_lengths,
                                     _tf.shape(score)[1])
            score = _tf.where(mask, score,
                              _tf.fill(_tf.shape(score), float("-inf")))
        p = _tf.sigmoid(score)
        # exclusive cumprod of (1-p), clipped as in TF's safe_cumprod
        cumprod = _tf.math.cumprod(1.0 - p, axis=-1, exclusive=True)
        cumprod = _tf.clip_by_value(cumprod, 1e-10, 1.0)
        return p * cumprod * _tf.math.cumsum(previous / cumprod, axis=-1)

    def __call__(self, query, state):
        if self._site is None:
            self._site = _ScopeSite(default_name=self._score_scope)
        with self._site.enter():
            processed = self.query_layer(query)[:, None, :]
            vv = v1.get_variable("attention_v", [self._num_units])
            score = _tf.reduce_sum(
                vv * _tf.tanh(self.keys + processed), [2])
            score = score + v1.get_variable(
                "attention_score_bias", [],
                initializer=v1.zeros_initializer())
        alignments = self._probability_fn(score, state)
        return alignments, alignments


class LuongAttention:
    """TF1.15 LuongAttention: memory_layer only; score = q . keys^T,
    optionally scaled by the 'attention_g' scalar."""

    def __init__(self, num_units, memory, memory_sequence_length=None,
                 scale=False, name=None):
        self._num_units = int(num_units)
        self._scale = scale
        self.memory_layer = Dense(num_units, use_bias=False,
                                  name="memory_layer")
        self.query_layer = None
        self._memory_lengths = memory_sequence_length
        self.values = BahdanauAttention._mask_memory(
            memory, memory_sequence_length)
        self.keys = self.memory_layer(self.values)
        self._site = None

    initial_alignments = BahdanauAttention.initial_alignments
    initial_state = BahdanauAttention.initial_alignments
    alignments_size = BahdanauAttention.alignments_size
    _probability_fn = BahdanauAttention._probability_fn

    def __call__(self, query, state):
        if self._site is None:
            self._site = _ScopeSite(default_name="luong_attention")
        with self._site.enter():
            score = _tf.squeeze(
                _tf.matmul(self.keys, query[:, :, None]), [2])
            if self._scale:
                g = v1.get_variable(
                    "attention_g", initializer=np.float32(1.0))
                score = g * score
        alignments = self._probability_fn(score, state)
        return alignments, alignments


class AttentionWrapper(RNNCell):
    """TF1.15 AttentionWrapper with the reference's construction args:
    attention_layer_size=None (attention = raw context),
    output_attention=False (output = cell output), alignment_history."""

    def __init__(self, cell, attention_mechanism, alignment_history=False,
                 output_attention=True, attention_layer_size=None):
        super().__init__()
        assert attention_layer_size is None and not output_attention
        self._cell = cell
        self._mechanism = attention_mechanism
        self._history = alignment_history

    @property
    def output_size(self):
        return self._cell.output_size

    @property
    def state_size(self):
        # .attention must be the context width as an int: the reference's
        # ConcatOutputAndAttentionWrapper.output_size adds it to the cell
        # output size (rnn_wrappers.py:56).
        return AttentionWrapperState(
            cell_state=self._cell.state_size,
            attention=int(self._mechanism.values.shape[-1]), time=0,
            alignments=None, alignment_history=None, attention_state=None)

    def call(self, inputs, state):
        cell_inputs = _tf.concat([inputs, state.attention], -1)
        cell_output, next_cell_state = self._cell(cell_inputs,
                                                  state.cell_state)
        alignments, next_attention_state = self._mechanism(
            cell_output, state.attention_state)
        # context = sum_t a_t * values_t; attention == context here
        # (attention_layer_size=None)
        context = _tf.squeeze(
            _tf.matmul(alignments[:, None, :], self._mechanism.values), [1])
        history = (state.alignment_history.append(alignments)
                   if self._history else state.alignment_history)
        next_state = AttentionWrapperState(
            cell_state=next_cell_state, attention=context,
            time=state.time + 1, alignments=alignments,
            alignment_history=history,
            attention_state=next_attention_state)
        return cell_output, next_state

    def zero_state(self, batch_size, dtype):
        mem_dim = int(self._mechanism.values.shape[-1])
        return AttentionWrapperState(
            cell_state=self._cell.zero_state(batch_size, dtype),
            attention=_tf.zeros(_tf.stack([batch_size, mem_dim]), dtype),
            time=0,
            alignments=self._mechanism.initial_alignments(batch_size, dtype),
            alignment_history=_AlignmentHistory(),
            attention_state=self._mechanism.initial_state(batch_size, dtype))


class Helper:
    """Abstract base matching contrib.seq2seq.Helper's duck type (the
    reference's TacoTestHelper/TacoTrainingHelper subclass this)."""


class BasicDecoder:
    def __init__(self, cell, helper, initial_state):
        self.cell = cell
        self.helper = helper
        self.initial_state = initial_state


def dynamic_decode(decoder, maximum_iterations=None, scope=None,
                   impute_finished=False):
    """TF1.15 dynamic_decode semantics, Python-unrolled (static step
    count): helper initialize -> loop {cell, sample, next_inputs},
    outputs of rows already finished before a step emit zeros, loop ends
    when all rows finish or at maximum_iterations.

    Python-unrolled (vs TF1's while_loop) requires static bounds: the
    helper must drive all rows to finished within ``maximum_iterations``,
    which both Taco helpers do (teacher forcing finishes at its fixed
    step count; the test helper is capped by maximum_iterations).
    """
    assert maximum_iterations is not None
    with shim_variable_scope(scope, "decoder"):
        finished, next_inputs = decoder.helper.initialize()
        state = decoder.initial_state
        outputs = []
        for t in range(int(maximum_iterations)):
            out, state = decoder.cell(next_inputs, state)
            sample_ids = decoder.helper.sample(t, out, state)
            emit = _tf.where(finished[:, None], _tf.zeros_like(out), out)
            outputs.append(emit)
            step_finished, next_inputs, state = decoder.helper.next_inputs(
                t, out, state, sample_ids)
            finished = _tf.logical_or(finished, step_finished)
            # Static early exit requires a statically-known all-finished;
            # the Taco training helper's count is static via its targets'
            # shape, surfaced here through numpy evaluation when possible.
            sf = _static_all_true(finished)
            if sf:
                break
        stacked = _tf.stack(outputs, axis=1)  # [N, S, out_dim]
    return (stacked, None), state, None


def _static_all_true(t) -> bool:
    """True iff ``t`` is statically provably all-True (teacher-forced
    decoding reaches this at its final step: time+1 >= num_steps compares
    constants when target shapes are static)."""
    try:
        val = _tf.get_static_value(t)
        return val is not None and bool(np.all(val))
    except Exception:  # pragma: no cover - defensive
        return False


# ---------------------------------------------------------------------------
# bidirectional_dynamic_rnn (unrolled; TF1 masking semantics)
# ---------------------------------------------------------------------------

def _unrolled_rnn(cell, inputs, lengths, dtype):
    """dynamic_rnn over static time steps: outputs past a row's length
    are zeros and state holds (TF1 dynamic_rnn semantics)."""
    n = _tf.shape(inputs)[0]
    t_steps = int(inputs.shape[1])
    state = cell.zero_state(n, dtype)
    mask = (None if lengths is None
            else _tf.sequence_mask(lengths, t_steps))
    outs = []
    for t in range(t_steps):
        out, new_state = cell(inputs[:, t], state)
        if mask is not None:
            mt = mask[:, t][:, None]
            out = _tf.where(mt, out, _tf.zeros_like(out))
            state = _pytree_where(mt, new_state, state)
        else:
            state = new_state
        outs.append(out)
    return _tf.stack(outs, axis=1), state


def _pytree_where(cond, a, b):
    if isinstance(a, LSTMStateTuple):
        return LSTMStateTuple(_tf.where(cond, a.c, b.c),
                              _tf.where(cond, a.h, b.h))
    if isinstance(a, tuple):
        return tuple(_pytree_where(cond, x, y) for x, y in zip(a, b))
    return _tf.where(cond, a, b)


def _reverse_seq(x, lengths):
    if lengths is None:
        return x[:, ::-1]
    return _tf.reverse_sequence(x, lengths, seq_axis=1, batch_axis=0)


def bidirectional_dynamic_rnn(cell_fw, cell_bw, inputs, sequence_length=None,
                              initial_state_fw=None, initial_state_bw=None,
                              dtype=None, scope=None):
    """TF1 semantics + TF1 scope names (bidirectional_rnn/fw, /bw; the
    cell's own scope nests inside). Initial states seed their direction
    (the reference's speaker-conditioned CBHG GRU state)."""
    dtype = dtype or _tf.float32
    with shim_variable_scope(scope, "bidirectional_rnn"):
        with v1.variable_scope("fw", reuse=v1.AUTO_REUSE):
            if initial_state_fw is not None:
                out_fw, st_fw = _unrolled_rnn_init(
                    cell_fw, inputs, sequence_length, dtype, initial_state_fw)
            else:
                out_fw, st_fw = _unrolled_rnn(cell_fw, inputs,
                                              sequence_length, dtype)
        rev = _reverse_seq(inputs, sequence_length)
        with v1.variable_scope("bw", reuse=v1.AUTO_REUSE):
            if initial_state_bw is not None:
                out_bw_r, st_bw = _unrolled_rnn_init(
                    cell_bw, rev, sequence_length, dtype, initial_state_bw)
            else:
                out_bw_r, st_bw = _unrolled_rnn(cell_bw, rev,
                                                sequence_length, dtype)
        out_bw = _reverse_seq(out_bw_r, sequence_length)
    return (out_fw, out_bw), (st_fw, st_bw)


def _unrolled_rnn_init(cell, inputs, lengths, dtype, state0):
    n = _tf.shape(inputs)[0]
    t_steps = int(inputs.shape[1])
    state = state0
    mask = (None if lengths is None
            else _tf.sequence_mask(lengths, t_steps))
    outs = []
    for t in range(t_steps):
        out, new_state = cell(inputs[:, t], state)
        if mask is not None:
            mt = mask[:, t][:, None]
            out = _tf.where(mt, out, _tf.zeros_like(out))
            state = _pytree_where(mt, new_state, state)
        else:
            state = new_state
        outs.append(out)
    return _tf.stack(outs, axis=1), state


# ---------------------------------------------------------------------------
# Module objects to inject into sys.modules as tensorflow.contrib.*
# ---------------------------------------------------------------------------

def make_contrib_modules():
    """(contrib, contrib.rnn, contrib.seq2seq) module objects for
    sys.modules injection — `from tensorflow.contrib.rnn import GRUCell`
    then binds against these."""
    rnn = types.ModuleType("tensorflow.contrib.rnn")
    rnn.RNNCell = RNNCell
    rnn.GRUCell = GRUCell
    rnn.LSTMBlockCell = LSTMBlockCell
    rnn.MultiRNNCell = MultiRNNCell
    rnn.OutputProjectionWrapper = OutputProjectionWrapper
    rnn.ResidualWrapper = ResidualWrapper
    rnn.LSTMStateTuple = LSTMStateTuple

    seq2seq = types.ModuleType("tensorflow.contrib.seq2seq")
    seq2seq.BahdanauAttention = BahdanauAttention
    seq2seq.BahdanauMonotonicAttention = BahdanauMonotonicAttention
    seq2seq.LuongAttention = LuongAttention
    seq2seq.AttentionWrapper = AttentionWrapper
    seq2seq.BasicDecoder = BasicDecoder
    seq2seq.dynamic_decode = dynamic_decode
    seq2seq.Helper = Helper

    contrib = types.ModuleType("tensorflow.contrib")
    contrib.rnn = rnn
    contrib.seq2seq = seq2seq
    layers_ns = types.SimpleNamespace(
        xavier_initializer_conv2d=lambda: v1.glorot_uniform_initializer())
    contrib.layers = layers_ns
    return contrib, rnn, seq2seq


REFERENCE_ROOT = "/root/reference"


def install_reference_stubs():
    """Pre-seed sys.modules so the REAL reference model files import:
    tensorflow.contrib.* resolves to the shim, and the reference's
    non-model utility modules (audio, infolog, text.symbols) resolve to
    minimal stand-ins (their TF1-era dependencies — unidecode, inflect,
    tf.py_func audio ops — are irrelevant to graph parity)."""
    from nspeech_tpu.text.symbols import symbols as our_symbols

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    contrib, rnn, seq2seq = make_contrib_modules()
    sys.modules["tensorflow.contrib"] = contrib
    sys.modules["tensorflow.contrib.rnn"] = rnn
    sys.modules["tensorflow.contrib.seq2seq"] = seq2seq
    audio = stub("neural_speech.utils.audio",
                 inv_spectrogram_tensorflow=lambda x: x)
    infolog = stub("neural_speech.utils.infolog", log=lambda *a, **k: None)
    text = stub("neural_speech.utils.text")
    # The 149-symbol vocabulary is the shared checkpoint contract
    # (PARITY.md): our frozen table IS the reference's.
    symbols_mod = stub("neural_speech.utils.text.symbols",
                       symbols=list(our_symbols))
    text.symbols = symbols_mod
    stub("neural_speech.utils", audio=audio, infolog=infolog, text=text)


def load_reference_models():
    """Import the REAL reference models package (/root/reference) against
    the shim and return it; every reference model module's ``tf`` is
    swapped for the shim proxy."""
    install_reference_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import neural_speech.models as M  # noqa: the real reference package

    proxy = TFProxy()
    for name, mod in list(sys.modules.items()):
        if name.startswith("neural_speech.models") and hasattr(mod, "tf"):
            mod.tf = proxy
    return M


class TFProxy:
    """The ``tf`` the reference model files see: tf.compat.v1 plus the
    shim surface (layers, contrib, nn.bidirectional_dynamic_rnn,
    variable_scope with unrolled-reuse semantics)."""

    def __init__(self):
        contrib, _, _ = make_contrib_modules()
        self._contrib = contrib
        self._nn = types.SimpleNamespace(
            bidirectional_dynamic_rnn=bidirectional_dynamic_rnn,
            **{k: getattr(_tf.nn, k)
               for k in ("relu", "sigmoid", "tanh", "softsign", "softmax",
                         "embedding_lookup", "dropout", "moments", "conv1d",
                         "batch_normalization", "max_pool2d")})
        self.layers = layers

    def variable_scope(self, *a, **k):
        return shim_variable_scope(*a, **k)

    @property
    def contrib(self):
        return self._contrib

    @property
    def nn(self):
        return self._nn

    def __getattr__(self, name):
        return getattr(v1, name)
