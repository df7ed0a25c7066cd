"""Learned condition embeddings (summary networks) for conditional flows.

Standard SBI practice when the conditioning observation x is high-
dimensional: a trainable embedding MLP maps the raw conditions to a
compact summary vector, learned JOINTLY with the flow by the same NLL
objective (the "embedding network" of SNPE / the learned summary
statistics of neural posterior estimation).

No reference counterpart — DensityFlows.jl feeds raw θ straight into
``vcat(θ, x)`` (/root/reference/src/affine/RNVP.jl:157). Here the
embedding composes transparently: :class:`EmbeddedChain` wraps any model
chain, transforms ``theta`` once per call, and forwards the flow element
protocol (``forward``/``inverse``/``forward_``), so ``Flow``, ``train``
(one fused program, embedding gradients included), sampling, and
checkpointing all work unchanged. θ-normalization still happens once at
the ``Flow`` boundary — the embedding sees normalized conditions.
"""

from __future__ import annotations

import dataclasses

import jax

from ..ops.mlp import MLP, apply_mlp, count_params, init_mlp

__all__ = ["EmbeddedChain", "embed_conditions"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EmbeddedChain:
    """Model chain whose conditions pass through a trainable embedding MLP.

    Layers inside ``chain`` must be built for ``n = embed_dim``
    conditions (the embedding output width), not the raw condition
    width.
    """

    embed: MLP
    chain: object  # FlowChain (any flow element protocol)

    def _e(self, theta):
        return apply_mlp(self.embed, theta)

    def forward(self, z, theta):
        return self.chain.forward(z, self._e(theta))

    def inverse(self, x, theta):
        return self.chain.inverse(x, self._e(theta))

    def forward_(self, z, theta):
        return self.chain.forward_(z, self._e(theta))

    # container conveniences mirror FlowChain
    def __len__(self) -> int:
        return len(self.chain)

    def __iter__(self):
        return iter(self.chain)

    @property
    def layers(self):
        return self.chain.layers

    def summarize(self) -> str:
        return (
            f"ConditionEmbedding | {list(self.embed.dims)} "
            f"({count_params(self.embed)} parameters)\n"
            + self.chain.summarize()
        )


def embed_conditions(
    chain,
    n_raw: int,
    embed_dim: int,
    *,
    key=None,
    n_sublayers: int = 2,
    hidden_dim: int = 64,
    activation: str = "relu",
) -> EmbeddedChain:
    """Wrap ``chain`` with a fresh ``n_raw → embed_dim`` embedding MLP.

    ``chain``'s layers must have been built with ``n = embed_dim``."""
    if key is None:
        key = jax.random.key(0)
    embed = init_mlp(
        key, n_raw, embed_dim, n_sublayers,
        hidden_dim=hidden_dim, activation=activation,
    )
    return EmbeddedChain(embed, chain)
