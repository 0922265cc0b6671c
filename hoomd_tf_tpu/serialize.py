"""Model and simulation checkpointing.

The reference delegates to Keras (``model.save`` / ``load_model`` with a
``custom_objects`` registry, ``__init__.py:30-38``); here models serialize
as ``(class, get_config(), weights)`` and the whole simulation pytree
(params + optimizer state + sim state + rng) can be checkpointed for exact
resume -- strictly more capable than the reference (SURVEY.md section 5,
checkpoint/resume).
"""

import pickle

import jax.numpy as jnp
import numpy as np

__all__ = ["save_model", "load_model", "custom_objects",
           "save_checkpoint", "load_checkpoint"]

#: registry used to resolve classes at load time, mirroring the reference's
#: Keras ``custom_objects`` (populated with the built-ins; users add their
#: SimModel subclasses or pass them to :func:`load_model`)
custom_objects = {}


def _register_builtins():
    from .models.layers import RBFExpansion, WCARepulsion, EDSLayer, Dense
    from .models.simmodel import SimModel, MolSimModel
    from .models.pair import PairModel
    from .models.potentials import (LJPotential, TrainableLJ,
                                    NeuralPairPotential)
    for cls in (RBFExpansion, WCARepulsion, EDSLayer, Dense, SimModel,
                MolSimModel, PairModel, LJPotential, TrainableLJ,
                NeuralPairPotential):
        custom_objects[cls.__name__] = cls


def save_model(model, path):
    """Serialize a model as (class name, config, weights)."""
    payload = {
        "class_name": type(model).__name__,
        "config": model.get_config(),
        "weights": [np.asarray(w) for w in model.get_weights()],
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_model(path, custom_objects_arg=None, build_inputs=None):
    """Load a model saved with :func:`save_model`.

    :param path: file path.
    :param custom_objects_arg: dict mapping class names to classes (merged
        over the global :data:`custom_objects` registry).
    :param build_inputs: optional model inputs used to materialize lazily
        built variables before restoring weights (needed when the model
        contains :class:`.Dense`/metric layers built on first call).
    """
    if not custom_objects:
        _register_builtins()
    registry = dict(custom_objects)
    if custom_objects_arg:
        registry.update(custom_objects_arg)
    with open(path, "rb") as f:
        payload = pickle.load(f)
    cls = registry.get(payload["class_name"])
    if cls is None:
        raise ValueError(
            f"Unknown model class {payload['class_name']!r}; pass it via "
            "custom_objects")
    model = cls.from_config(payload["config"]) if hasattr(
        cls, "from_config") else cls(**payload["config"])
    if build_inputs is not None:
        model.ensure_built(build_inputs)
    model.set_weights(payload["weights"])
    return model


def save_checkpoint(path, model=None, sim=None, tfc=None, extra=None):
    """Checkpoint everything needed for exact resume: model weights,
    optimizer state, simulation state (positions/velocities/box/rng)."""
    import jax

    payload = {"extra": extra}
    if model is not None:
        payload["weights"] = [np.asarray(w) for w in model.get_weights()]
        if model._opt_state is not None:
            payload["model_opt_state"] = jax.tree_util.tree_map(
                np.asarray, model._opt_state)
    if tfc is not None and tfc.opt_state is not None:
        payload["tfc_opt_state"] = jax.tree_util.tree_map(
            np.asarray, tfc.opt_state)
    if sim is not None and sim.state is not None:
        payload["sim_state"] = jax.tree_util.tree_map(
            np.asarray, sim.state)
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(path, model=None, sim=None, tfc=None):
    """Restore a checkpoint written by :func:`save_checkpoint`.
    Returns the ``extra`` payload."""
    import jax

    with open(path, "rb") as f:
        payload = pickle.load(f)
    if model is not None and "weights" in payload:
        model.set_weights(payload["weights"])
        if "model_opt_state" in payload:
            model._opt_state = jax.tree_util.tree_map(
                jnp.asarray, payload["model_opt_state"])
    if tfc is not None and "tfc_opt_state" in payload:
        tfc.opt_state = jax.tree_util.tree_map(
            jnp.asarray, payload["tfc_opt_state"])
    if sim is not None and "sim_state" in payload:
        state = jax.tree_util.tree_map(jnp.asarray, payload["sim_state"])
        sim.set_state(state)
    return payload.get("extra")
