"""Checkpoint / resume of long analyses.

Green-field feature: the reference's checkpoint.c is an empty stub
(checkpoint.c:4-8, "Up to you Salva...").  State captured: topology
(edge list + branch lengths), model parameters, progress stage, RNG
seed, and — for bootstrap runs — per-replicate completion.  Written
atomically (tmp + rename) as a single .npz so a killed job resumes
mid-analysis.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


class Checkpointer:
    def __init__(self, path: str, every_s: float = 300.0):
        self.path = path
        self.every_s = every_s
        self._last = 0.0

    def save(self, topo, params, stage: str, extra: dict | None = None,
             force: bool = False) -> bool:
        now = time.monotonic()
        if not force and now - self._last < self.every_s:
            return False
        self._last = now
        payload = {
            "edges": np.asarray(topo.edges),
            "blen": np.asarray(topo.blen),
            "n_otu": np.asarray(topo.n_otu),
            "stage": np.asarray(stage),
        }
        for k, v in params.items():
            payload[f"param_{k}"] = np.asarray(v)
        if extra:
            payload["extra"] = np.asarray(json.dumps(extra))
        tmp = self.path + ".tmp"
        with open(tmp, "wb") as fh:
            np.savez(fh, **payload)
        os.replace(tmp, self.path)
        return True

    def resume(self):
        """(topo, params, stage) or None if no checkpoint exists."""
        if not os.path.exists(self.path):
            return None
        import jax.numpy as jnp

        from phyml_tpu.topology import Topology

        z = np.load(self.path, allow_pickle=False)
        topo = Topology(int(z["n_otu"]), z["edges"], z["blen"])
        params = {
            k[len("param_"):]: jnp.asarray(z[k])
            for k in z.files if k.startswith("param_")
        }
        stage = str(z["stage"])
        return topo, params, stage

    def extra(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        z = np.load(self.path, allow_pickle=False)
        if "extra" in z.files:
            return json.loads(str(z["extra"]))
        return {}


# ----------------------------------------------------------------------
# MCMC chain checkpointing (green-field; the reference has none)
# ----------------------------------------------------------------------

def save_chain(path: str, state, done: int, step_sizes,
               key=None, extra: dict | None = None) -> None:
    """Atomically persist an MCMC ChainState + progress so a killed
    chain resumes mid-run: all state arrays (incl. the sampled
    topology), iteration count, tuned step sizes, and the PRNG key.
    `extra` is any JSON-serializable side state (e.g. the host
    topology-proposal RNG's bit-generator state + move counters)."""
    payload = {"done": np.asarray(done),
               "step_sizes": np.asarray(step_sizes)}
    if key is not None:
        payload["key"] = np.asarray(key)
    if extra is not None:
        payload["extra_json"] = np.asarray(json.dumps(extra))
    for field_name, v in state._asdict().items():
        if isinstance(v, dict):
            for k2, v2 in v.items():
                payload[f"dict_{field_name}__{k2}"] = np.asarray(v2)
            payload[f"dictkeys_{field_name}"] = np.asarray(
                ",".join(v.keys()))
        else:
            payload[f"field_{field_name}"] = np.asarray(v)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **payload)
    os.replace(tmp, path)


def load_chain(path: str, state_cls):
    """(state, done, step_sizes, key|None, extra) or None if absent.

    Raises ValueError on a format mismatch (a ChainState field with
    no entry in the npz — e.g. a checkpoint written before a field
    was added): resuming into a structurally corrupt state would
    otherwise fail far away with a confusing error."""
    if not os.path.exists(path):
        return None
    import jax.numpy as jnp

    z = np.load(path, allow_pickle=False)
    fields = {}
    missing = []
    for name in state_cls._fields:
        fk = f"field_{name}"
        dk = f"dictkeys_{name}"
        if fk in z.files:
            fields[name] = jnp.asarray(z[fk])
        elif dk in z.files:
            keys = str(z[dk]) and str(z[dk]).split(",")
            keys = [k for k in keys if k]
            fields[name] = {
                k: jnp.asarray(z[f"dict_{name}__{k}"]) for k in keys
            }
        else:
            missing.append(name)
    if missing:
        raise ValueError(
            f"checkpoint {path!r} lacks ChainState field(s) "
            f"{missing}: written by an older format — delete it to "
            f"start fresh")
    key = jnp.asarray(z["key"]) if "key" in z.files else None
    extra = (json.loads(str(z["extra_json"]))
             if "extra_json" in z.files else {})
    return (state_cls(**fields), int(z["done"]),
            np.asarray(z["step_sizes"]), key, extra)
