"""Minimal stateful-module system over functional JAX.

The reference builds on Keras: layers own ``tf.Variable`` s that are read and
assigned imperatively inside ``compute`` (running metrics, the EDS layer's
internal optimizer state). JAX is purely functional, so this module system
provides the same imperative *surface* while keeping a clean functional core:

- :class:`Variable` holds a ``jax.Array`` value. ``assign``-family writes are
  wrapped in ``stop_gradient`` to reproduce TF variable semantics (gradients
  never flow through an assignment -- this is also what makes the
  force-capture replay in :mod:`..ops.forces` faithful).
- :class:`Layer` collects variables by attribute traversal, in deterministic
  creation order.
- :func:`functional_call` injects a flat list of values into a module, runs
  it, and reads the (possibly mutated) values back out -- the bridge used to
  put a stateful model inside ``jit`` / ``lax.scan`` / ``grad``.

There is deliberately no ``init``/``apply`` split (flax) and no transform
(haiku): the reference API creates layers eagerly in ``setup`` and that is
what users of the reference expect to keep doing.
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Variable", "Layer", "Mean", "MeanTensor",
           "get_state", "set_state", "functional_call"]


class Variable:
    """A mutable named array slot, analogous to ``tf.Variable``."""

    def __init__(self, value, trainable=True, name=None, constraint=None,
                 regularizer=None, dtype=None):
        self.value = jnp.asarray(value, dtype=dtype)
        self.initial_value = self.value
        self.trainable = trainable
        self.name = name
        self.constraint = constraint
        self.regularizer = regularizer

    # -- TF-style mutation (gradient-stopping, like tf.Variable.assign) -----
    def assign(self, value):
        self.value = jax.lax.stop_gradient(
            jnp.asarray(value, dtype=self.value.dtype))
        return self

    def assign_add(self, value):
        return self.assign(self.value + value)

    def assign_sub(self, value):
        return self.assign(self.value - value)

    # -- conveniences --------------------------------------------------------
    def numpy(self):
        return np.asarray(self.value)

    @property
    def shape(self):
        return self.value.shape

    @property
    def dtype(self):
        return self.value.dtype

    def __repr__(self):
        return (f"Variable(name={self.name!r}, shape={self.value.shape}, "
                f"dtype={self.value.dtype}, trainable={self.trainable})")

    # arithmetic sugar so `self.sigma * x` works like a tf.Variable
    def __jax_array__(self):
        return self.value

    def __mul__(self, o):
        return self.value * o

    def __rmul__(self, o):
        return o * self.value

    def __add__(self, o):
        return self.value + o

    def __radd__(self, o):
        return o + self.value

    def __sub__(self, o):
        return self.value - o

    def __rsub__(self, o):
        return o - self.value

    def __truediv__(self, o):
        return self.value / o

    def __rtruediv__(self, o):
        return o / self.value

    def __pow__(self, o):
        return self.value ** o

    def __neg__(self):
        return -self.value


class Layer:
    """Base class for parameterized computations.

    Subclasses implement ``call`` and create weights with :meth:`add_weight`
    (typically in ``__init__`` or, for :class:`SimModel`, in ``setup``).
    """

    def __init__(self, name=None, dtype=jnp.float32):
        self.name = name or type(self).__name__.lower()
        self._layer_dtype = jnp.dtype(dtype)
        self._own_variables = []

    @property
    def dtype(self):
        return getattr(self, "_layer_dtype", jnp.dtype(jnp.float32))

    def add_weight(self, shape=(), initializer=None, trainable=True,
                   constraint=None, regularizer=None, dtype=None, name=None):
        dtype = dtype or self.dtype
        # lazily-built weights may be created during an *abstract* call
        # (SimModel.ensure_built runs under jax.eval_shape); the initial
        # value must still be a concrete array, not a tracer that would
        # escape the trace
        import jax as _jax
        with _jax.ensure_compile_time_eval():
            if initializer is None:
                value = jnp.zeros(shape, dtype=dtype)
            elif callable(initializer):
                value = jnp.asarray(initializer(shape), dtype=dtype)
            else:
                value = jnp.broadcast_to(
                    jnp.asarray(initializer, dtype=dtype), shape)
        v = Variable(value, trainable=trainable, name=name,
                     constraint=constraint, regularizer=regularizer)
        if not hasattr(self, "_own_variables"):
            self._own_variables = []
        self._own_variables.append(v)
        return v

    # -- traversal -----------------------------------------------------------
    def _children(self):
        """(name, child) pairs for sub-layers, in attribute creation order."""
        for k, v in vars(self).items():
            if isinstance(v, Layer):
                yield k, v
            elif isinstance(v, (list, tuple)):
                for i, item in enumerate(v):
                    if isinstance(item, Layer):
                        yield f"{k}[{i}]", item

    @property
    def variables(self):
        """All variables of this layer and sub-layers, deterministic order."""
        out = list(getattr(self, "_own_variables", []))
        for k, v in vars(self).items():
            if isinstance(v, Variable) and v not in out:
                out.append(v)
        for _, child in self._children():
            out.extend(child.variables)
        return out

    @property
    def trainable_variables(self):
        return [v for v in self.variables if v.trainable]

    @property
    def non_trainable_variables(self):
        return [v for v in self.variables if not v.trainable]

    @property
    def losses(self):
        """Regularization losses, like Keras ``layer.losses``."""
        return [v.regularizer(v.value) for v in self.variables
                if v.regularizer is not None]

    # -- weights I/O (Keras-style) -------------------------------------------
    def get_weights(self):
        return [np.asarray(v.value) for v in self.variables]

    def set_weights(self, weights):
        vs = self.variables
        if len(weights) != len(vs):
            raise ValueError(
                f"Expected {len(vs)} weight arrays, got {len(weights)}")
        for v, w in zip(vs, weights):
            w = jnp.asarray(w, dtype=v.value.dtype)
            if w.shape != v.value.shape:
                raise ValueError(
                    f"Shape mismatch for {v.name}: {w.shape} vs "
                    f"{v.value.shape}")
            v.value = w

    # -- call ------------------------------------------------------------------
    def call(self, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, *args, **kwargs):
        return self.call(*args, **kwargs)


# --------------------------------------------------------------------------
# State threading helpers
# --------------------------------------------------------------------------

def get_state(module):
    """Flat list of all variable values of ``module`` (a :class:`Layer`)."""
    return [v.value for v in module.variables]


def set_state(module, values):
    """Write a flat list of values (from :func:`get_state`) back into
    ``module``'s variables. Direct writes -- no ``stop_gradient`` -- so this
    is the differentiable injection point for training."""
    vs = module.variables
    assert len(vs) == len(values), (len(vs), len(values))
    for v, val in zip(vs, values):
        v.value = val


def functional_call(module, values, fn, *args, **kwargs):
    """Run ``fn(*args, **kwargs)`` with ``module``'s variables set to
    ``values``; return ``(output, new_values)``.

    This is the purely-functional bridge used to place stateful models inside
    ``jit``/``scan``/``grad``: ``values`` may be tracers, and any in-call
    mutations (metrics, EDS state) are read back out as ``new_values``.
    """
    old = get_state(module)
    set_state(module, values)
    try:
        out = fn(*args, **kwargs)
        new_values = get_state(module)
    finally:
        set_state(module, old)
    return out, new_values


# --------------------------------------------------------------------------
# Running metrics (Keras tf.keras.metrics.{Mean, MeanTensor} equivalents)
# --------------------------------------------------------------------------

class Mean(Layer):
    """Running scalar mean, like ``tf.keras.metrics.Mean``."""

    def __init__(self, name="mean", dtype=jnp.float32):
        super().__init__(name=name, dtype=dtype)
        self.total = self.add_weight((), trainable=False, name=f"{name}.total")
        self.count = self.add_weight((), trainable=False, name=f"{name}.count")

    def update_state(self, values):
        values = jnp.asarray(values, dtype=self.dtype)
        self.total.assign_add(jnp.sum(values))
        # shapes are static under XLA, so .size is always a Python int
        self.count.assign_add(float(values.size))
        return self

    def result(self):
        from ..ops.numerics import divide_no_nan
        return divide_no_nan(self.total.value, self.count.value)

    def reset_state(self):
        self.total.assign(0.0)
        self.count.assign(0.0)

    def call(self, values):
        return self.update_state(values)


class MeanTensor(Layer):
    """Elementwise running mean of a fixed-shape tensor, like
    ``tf.keras.metrics.MeanTensor``. The shape is fixed on first update."""

    def __init__(self, name="mean_tensor", dtype=jnp.float32):
        super().__init__(name=name, dtype=dtype)
        self.total = None
        self.count = None

    def _build(self, shape):
        self.total = self.add_weight(shape, trainable=False,
                                     name=f"{self.name}.total")
        self.count = self.add_weight(shape, trainable=False,
                                     name=f"{self.name}.count")

    def update_state(self, values):
        values = jnp.asarray(values, dtype=self.dtype)
        if self.total is None:
            self._build(values.shape)
        self.total.assign_add(values)
        self.count.assign_add(jnp.ones_like(values))
        return self

    def result(self):
        from ..ops.numerics import divide_no_nan
        return divide_no_nan(self.total.value, self.count.value)

    def reset_state(self):
        if self.total is not None:
            self.total.assign(jnp.zeros_like(self.total.value))
            self.count.assign(jnp.zeros_like(self.count.value))

    def call(self, values):
        return self.update_state(values)
