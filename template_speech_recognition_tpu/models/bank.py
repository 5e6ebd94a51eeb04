"""Template bank container (SURVEY.md sections 2c, 3.2).

A bank stacks K Bernoulli templates of a common registered length into
one [K, L, F, E] tensor -- the natural unit for batched MXU scoring
and for sharding the bank axis across chips (config 5,
BASELINE.json:11).  Labels map each template back to its class (a
class contributes one template per mixture component).
"""

from __future__ import annotations

import dataclasses
import functools
import json

import jax
import jax.numpy as jnp
import numpy as np


# Filter builds are jitted so a fresh process compiles ONE cached
# executable per shape instead of dozens of sub-second eager ops, each
# of which costs a remote compile round trip on the tunneled PJRT
# (round-2 verdict, missing item 6).
@jax.jit
def _llr_jit(p, q):
    w = (jnp.log(p) - jnp.log1p(-p)) - (jnp.log(q) - jnp.log1p(-q))
    c = jnp.sum(jnp.log1p(-p) - jnp.log1p(-q), axis=(1, 2, 3))
    return w, c


@jax.jit
def _llr_rows_jit(p, q):
    w = (jnp.log(p) - jnp.log1p(-p)) - (jnp.log(q) - jnp.log1p(-q))
    c_rows = jnp.sum(jnp.log1p(-p) - jnp.log1p(-q), axis=(2, 3))
    return w, c_rows


@functools.partial(jax.jit, static_argnames=("scale",))
def _llr_quantized_jit(p, q, scale):
    w, c = _llr_jit(p, q)
    return (
        jnp.round(w * scale).astype(jnp.int32),
        jnp.round(c * scale).astype(jnp.int32),
    )


@dataclasses.dataclass
class TemplateBank:
    templates: jnp.ndarray          # [K, L, F, E] float32 in (0, 1)
    background: jnp.ndarray         # [F, E] float32 in (0, 1)
    labels: list[str]               # len K, class name per template
    # Parts-based banks (SURVEY.md row L5): the patch dictionary used to
    # re-code edge maps before scoring; None for raw-edge banks.  When
    # set, (F, E) above are (part-map freq extent, num_parts).
    parts: jnp.ndarray | None = None

    @property
    def num_templates(self) -> int:
        return int(self.templates.shape[0])

    @property
    def template_length(self) -> int:
        return int(self.templates.shape[1])

    @classmethod
    def from_classes(
        cls,
        class_templates: dict[str, np.ndarray | jnp.ndarray],
        background: np.ndarray | jnp.ndarray,
        parts: np.ndarray | jnp.ndarray | None = None,
    ) -> "TemplateBank":
        """class name -> [L,F,E] or [C,L,F,E]; classes sorted by name."""
        tpls, labels = [], []
        for name in sorted(class_templates):
            t = jnp.asarray(class_templates[name], dtype=jnp.float32)
            if t.ndim == 3:
                t = t[None]
            for comp in t:
                tpls.append(comp)
                labels.append(name)
        return cls(
            jnp.stack(tpls),
            jnp.asarray(background, dtype=jnp.float32),
            labels,
            None if parts is None else jnp.asarray(parts, jnp.float32),
        )

    def llr(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(W [K, L, F, E], c [K]) float32 -- SURVEY.md section 3.2."""
        return _llr_jit(self.templates, self.background)

    def llr_rows(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(W [K, L, F, E], c_rows [K, L]) -- per-row offsets for DTW."""
        return _llr_rows_jit(self.templates, self.background)

    def llr_quantized(self, scale: int) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Fixed-point (W int32, c int32) for the bit-parity path."""
        return _llr_quantized_jit(self.templates, self.background, scale)

    def save(self, path: str) -> None:
        arrays = dict(
            templates=np.asarray(self.templates),
            background=np.asarray(self.background),
            labels=json.dumps(self.labels),
        )
        if self.parts is not None:
            arrays["parts"] = np.asarray(self.parts)
        np.savez(path, **arrays)

    @classmethod
    def load(cls, path: str) -> "TemplateBank":
        z = np.load(path, allow_pickle=False)
        return cls(
            jnp.asarray(z["templates"]),
            jnp.asarray(z["background"]),
            json.loads(str(z["labels"])),
            jnp.asarray(z["parts"]) if "parts" in z.files else None,
        )
