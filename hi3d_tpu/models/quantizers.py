"""VQ regularizer family for the autoencoding engine.

Functional parity targets (reference file:line, all channels-last here):
- VectorQuantizer: sgm/modules/autoencoding/regularizers/quantize.py:172-320
  — nearest-codebook assignment, β-commitment loss, straight-through
  estimator, optional index remapping (`used` table) and perplexity logging.
- GumbelQuantizer: quantize.py:64-170 — 1×1-conv logits → gumbel-softmax
  one-hot mix of the codebook, KL-to-uniform prior loss.
- EMAVectorQuantizer: quantize.py:323-443 — codebook updated by exponential
  moving averages of cluster assignment counts / sums instead of gradients.
- VectorQuantizerWithInputProjection: quantize.py:446-480 — linear projection
  into and (optionally) out of the codebook space, with (B, ..., C) token
  flattening.
- measure_perplexity: regularizers/base.py:29-40.

These are the `sgm.modules.autoencoding.regularizers.quantize.*` surface —
unused by Hi3D's shipped KL configs but part of the engine's regularizer
plugin point. JAX idioms: codebooks and EMA statistics are explicit arrays on
the object (initialized via `init_params(rng)`); `__call__(z, rng)` is pure
given them except for EMA quantizers, whose `update(z)` returns the refreshed
statistics (functional counterpart of the reference's in-place
`cluster_size_ema_update`/`embed_avg_ema_update`/`weight_update`).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def measure_perplexity(indices: jax.Array, num_centroids: int):
    """base.py:29-40 — exp entropy of the empirical cluster distribution."""
    enc = jax.nn.one_hot(indices.reshape(-1), num_centroids)
    avg = enc.mean(axis=0)
    perplexity = jnp.exp(-jnp.sum(avg * jnp.log(avg + 1e-10)))
    cluster_use = jnp.sum(avg > 0)
    return perplexity, cluster_use


class _RemapMixin:
    """Index remapping via a `used` table (quantize.py:26-52)."""

    used: Optional[jnp.ndarray] = None
    re_embed: int = 0
    unknown_index = "random"

    def _setup_remap(self, remap: Optional[str], n: int, unknown_index):
        self.remap = remap
        if remap is not None:
            self.used = jnp.asarray(np.load(remap))
            self.re_embed = int(self.used.shape[0])
        else:
            self.used = None
            self.re_embed = n
        if unknown_index == "extra":
            self.unknown_index = self.re_embed
            self.re_embed += 1
        else:
            if unknown_index != "random" and not isinstance(unknown_index, int):
                raise ValueError(
                    "unknown_index needs to be 'random', 'extra' or an int"
                )
            self.unknown_index = unknown_index

    def remap_to_used(self, inds: jax.Array, rng=None) -> jax.Array:
        ishape = inds.shape
        flat = inds.reshape(ishape[0], -1)
        match = (flat[:, :, None] == self.used[None, None, :]).astype(jnp.int32)
        new = jnp.argmax(match, axis=-1)
        unknown = match.sum(axis=2) < 1
        if self.unknown_index == "random":
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            rand = jax.random.randint(rng, new.shape, 0, self.re_embed)
            new = jnp.where(unknown, rand, new)
        else:
            new = jnp.where(unknown, self.unknown_index, new)
        return new.reshape(ishape)

    def unmap_to_all(self, inds: jax.Array) -> jax.Array:
        ishape = inds.shape
        flat = inds.reshape(ishape[0], -1)
        if self.re_embed > self.used.shape[0]:  # extra token → 0
            flat = jnp.where(flat >= self.used.shape[0], 0, flat)
        back = self.used[flat]
        return back.reshape(ishape)


class VectorQuantizer(_RemapMixin):
    """quantize.py:172-320 (NHWC)."""

    def __init__(
        self,
        n_e: int,
        e_dim: int,
        beta: float = 0.25,
        remap: Optional[str] = None,
        unknown_index: str = "random",
        sane_index_shape: bool = False,
        log_perplexity: bool = False,
        embedding_weight_norm: bool = False,
        loss_key: str = "loss/vq",
    ):
        if embedding_weight_norm:
            raise NotImplementedError("embedding_weight_norm")
        self.n_e = int(n_e)
        self.e_dim = int(e_dim)
        self.beta = float(beta)
        self.loss_key = loss_key
        self.sane_index_shape = sane_index_shape
        self.log_perplexity = log_perplexity
        self.embedding: Optional[jax.Array] = None
        self._setup_remap(remap, self.n_e, unknown_index)

    def init_params(self, rng: jax.Array) -> jax.Array:
        # reference init: U(-1/n_e, 1/n_e) (quantize.py:203)
        self.embedding = jax.random.uniform(
            rng, (self.n_e, self.e_dim), minval=-1.0 / self.n_e,
            maxval=1.0 / self.n_e,
        )
        return self.embedding

    def _nearest(self, z_flat: jax.Array) -> jax.Array:
        d = (
            jnp.sum(z_flat**2, axis=1, keepdims=True)
            + jnp.sum(self.embedding**2, axis=1)
            - 2.0 * z_flat @ self.embedding.T
        )
        return jnp.argmin(d, axis=1)

    def __call__(self, z: jax.Array, rng=None) -> Tuple[jax.Array, Dict]:
        if self.embedding is None:
            self.init_params(jax.random.PRNGKey(0))
        if z.ndim > 4:
            raise ValueError("no reshaping strategy for inputs > 4 dims")
        z_flat = z.reshape(-1, self.e_dim)
        idx = self._nearest(z_flat)
        z_q = self.embedding[idx].reshape(z.shape)

        log: Dict = {}
        if self.log_perplexity:
            perplexity, cluster_usage = measure_perplexity(
                jax.lax.stop_gradient(idx), self.n_e
            )
            log.update({"perplexity": perplexity, "cluster_usage": cluster_usage})
        loss = self.beta * jnp.mean(
            (jax.lax.stop_gradient(z_q) - z) ** 2
        ) + jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2)
        log[self.loss_key] = loss

        z_q = z + jax.lax.stop_gradient(z_q - z)  # straight-through

        if self.remap is not None:
            idx = self.remap_to_used(idx.reshape(z.shape[0], -1), rng)
            idx = idx.reshape(-1, 1)
        if self.sane_index_shape:
            if z.ndim == 4:
                idx = idx.reshape(z_q.shape[0], z_q.shape[1], z_q.shape[2])
            else:
                idx = idx.reshape(z_q.shape[0], -1)
        log["min_encoding_indices"] = idx
        return z_q, log

    def get_codebook_entry(
        self, indices: jax.Array, shape: Optional[Tuple[int, ...]] = None
    ) -> jax.Array:
        """shape is (B, H, W, C) — NHWC output (reference returns NCHW)."""
        if self.remap is not None:
            if shape is None:
                raise ValueError("need shape for remap")
            indices = self.unmap_to_all(indices.reshape(shape[0], -1)).reshape(-1)
        z_q = self.embedding[indices]
        if shape is not None:
            z_q = z_q.reshape(shape)
        return z_q


class GumbelQuantizer(_RemapMixin):
    """quantize.py:64-170 (NHWC logits via 1×1 projection)."""

    def __init__(
        self,
        num_hiddens: int,
        embedding_dim: int,
        n_embed: int,
        straight_through: bool = True,
        kl_weight: float = 5e-4,
        temp_init: float = 1.0,
        remap: Optional[str] = None,
        unknown_index: str = "random",
        loss_key: str = "loss/vq",
    ):
        self.loss_key = loss_key
        self.embedding_dim = int(embedding_dim)
        self.n_embed = int(n_embed)
        self.num_hiddens = int(num_hiddens)
        self.straight_through = straight_through
        self.temperature = float(temp_init)
        self.kl_weight = float(kl_weight)
        self.proj_kernel: Optional[jax.Array] = None  # (num_hiddens, n_embed)
        self.proj_bias: Optional[jax.Array] = None
        self.embed: Optional[jax.Array] = None  # (n_embed, embedding_dim)
        self._setup_remap(remap, self.n_embed, unknown_index)

    def init_params(self, rng: jax.Array):
        r1, r2 = jax.random.split(rng)
        scale = 1.0 / np.sqrt(self.num_hiddens)
        self.proj_kernel = jax.random.uniform(
            r1, (self.num_hiddens, self.n_embed), minval=-scale, maxval=scale
        )
        self.proj_bias = jnp.zeros((self.n_embed,))
        self.embed = jax.random.normal(r2, (self.n_embed, self.embedding_dim))

    def __call__(
        self, z: jax.Array, rng=None, temp: Optional[float] = None,
        return_logits: bool = False, train: bool = True,
    ) -> Tuple[jax.Array, Dict]:
        if self.embed is None:
            self.init_params(jax.random.PRNGKey(0))
        hard = self.straight_through if train else True
        temp = self.temperature if temp is None else temp
        logits = z @ self.proj_kernel + self.proj_bias  # (..., n_embed)
        if self.remap is not None:
            logits_used = logits[..., self.used]
        else:
            logits_used = logits

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        gumbel = -jnp.log(
            -jnp.log(jax.random.uniform(rng, logits_used.shape) + 1e-20) + 1e-20
        )
        soft = jax.nn.softmax((logits_used + gumbel) / temp, axis=-1)
        if hard:
            one_hot = jax.nn.one_hot(
                jnp.argmax(soft, axis=-1), soft.shape[-1], dtype=soft.dtype
            )
            soft = soft + jax.lax.stop_gradient(one_hot - soft)
        if self.remap is not None:
            full = jnp.zeros_like(logits)
            soft = full.at[..., self.used].set(soft)

        z_q = soft @ self.embed  # (..., embedding_dim)

        qy = jax.nn.softmax(logits_used, axis=-1)
        diff = self.kl_weight * jnp.mean(
            jnp.sum(qy * jnp.log(qy * self.n_embed + 1e-10), axis=-1)
        )
        log: Dict = {self.loss_key: diff}
        ind = jnp.argmax(soft, axis=-1)
        log["indices"] = ind
        if self.remap is not None:
            log["indices"] = self.remap_to_used(ind, rng)
        if return_logits:
            log["logits"] = logits_used
        return z_q, log

    def get_codebook_entry(self, indices: jax.Array, shape) -> jax.Array:
        b, h, w, _ = shape
        indices = indices.reshape(b, h, w)
        if self.remap is not None:
            indices = self.unmap_to_all(indices)
        one_hot = jax.nn.one_hot(indices, self.n_embed)
        return one_hot @ self.embed


class EMAVectorQuantizer(_RemapMixin):
    """quantize.py:323-443 — gradient-free EMA codebook (NHWC)."""

    def __init__(
        self,
        n_embed: int,
        embedding_dim: int,
        beta: float,
        decay: float = 0.99,
        eps: float = 1e-5,
        remap: Optional[str] = None,
        unknown_index: str = "random",
        loss_key: str = "loss/vq",
    ):
        self.codebook_dim = int(embedding_dim)
        self.num_tokens = int(n_embed)
        self.beta = float(beta)
        self.decay = float(decay)
        self.eps = float(eps)
        self.loss_key = loss_key
        self.weight: Optional[jax.Array] = None
        self.cluster_size: Optional[jax.Array] = None
        self.embed_avg: Optional[jax.Array] = None
        self.update = True
        self._setup_remap(remap, self.num_tokens, unknown_index)

    def init_params(self, rng: jax.Array):
        self.weight = jax.random.normal(
            rng, (self.num_tokens, self.codebook_dim)
        )
        self.cluster_size = jnp.zeros((self.num_tokens,))
        self.embed_avg = self.weight.copy()

    def __call__(
        self, z: jax.Array, rng=None, train: bool = True
    ) -> Tuple[jax.Array, Dict]:
        if self.weight is None:
            self.init_params(jax.random.PRNGKey(0))
        z_flat = z.reshape(-1, self.codebook_dim)
        d = (
            jnp.sum(z_flat**2, axis=1, keepdims=True)
            + jnp.sum(self.weight**2, axis=1)
            - 2.0 * z_flat @ self.weight.T
        )
        idx = jnp.argmin(d, axis=1)
        z_q = self.weight[idx].reshape(z.shape)
        encodings = jax.nn.one_hot(idx, self.num_tokens, dtype=z.dtype)
        avg_probs = jnp.mean(encodings, axis=0)
        perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))

        ema_updates = None
        if train and self.update:
            ema_updates = self.compute_updates(encodings, z_flat)
            # Mutating self under jit would store tracers on the object and
            # break the next call — only auto-apply in eager mode; a jitted
            # caller applies `log["ema_updates"]` via apply_updates() outside
            # the traced region.
            if not isinstance(z_flat, jax.core.Tracer):
                self.apply_updates(*ema_updates)

        loss = self.beta * jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2)
        z_q = z + jax.lax.stop_gradient(z_q - z)
        log = {
            self.loss_key: loss,
            "encodings": encodings,
            "encoding_indices": idx,
            "perplexity": perplexity,
        }
        if ema_updates is not None:
            log["ema_updates"] = ema_updates
        return z_q, log

    def compute_updates(self, encodings: jax.Array, z_flat: jax.Array):
        """Pure EMA step (quantize.py:337-352): returns the new
        (cluster_size, embed_avg, weight) triple."""
        new_cs = self.cluster_size * self.decay + (1 - self.decay) * (
            encodings.sum(axis=0)
        )
        new_avg = self.embed_avg * self.decay + (1 - self.decay) * (
            encodings.T @ z_flat
        )
        n = new_cs.sum()
        smoothed = (new_cs + self.eps) / (n + self.num_tokens * self.eps) * n
        new_weight = new_avg / smoothed[:, None]
        return new_cs, new_avg, new_weight

    def apply_updates(self, cluster_size, embed_avg, weight):
        self.cluster_size = jax.lax.stop_gradient(cluster_size)
        self.embed_avg = jax.lax.stop_gradient(embed_avg)
        self.weight = jax.lax.stop_gradient(weight)


class VectorQuantizerWithInputProjection(VectorQuantizer):
    """quantize.py:446-480 — project tokens into codebook space (and back)."""

    def __init__(
        self,
        input_dim: int,
        n_codes: int,
        codebook_dim: int,
        beta: float = 1.0,
        output_dim: Optional[int] = None,
        **kwargs,
    ):
        super().__init__(n_codes, codebook_dim, beta, **kwargs)
        self.input_dim = int(input_dim)
        self.output_dim = output_dim
        self.proj_in_kernel: Optional[jax.Array] = None
        self.proj_in_bias: Optional[jax.Array] = None
        self.proj_out_kernel: Optional[jax.Array] = None
        self.proj_out_bias: Optional[jax.Array] = None

    def init_params(self, rng: jax.Array):
        r0, r1, r2 = jax.random.split(rng, 3)
        super().init_params(r0)
        s_in = 1.0 / np.sqrt(self.input_dim)
        self.proj_in_kernel = jax.random.uniform(
            r1, (self.input_dim, self.e_dim), minval=-s_in, maxval=s_in
        )
        self.proj_in_bias = jnp.zeros((self.e_dim,))
        if self.output_dim is not None:
            s_out = 1.0 / np.sqrt(self.e_dim)
            self.proj_out_kernel = jax.random.uniform(
                r2, (self.e_dim, self.output_dim), minval=-s_out, maxval=s_out
            )
            self.proj_out_bias = jnp.zeros((self.output_dim,))

    def __call__(self, z: jax.Array, rng=None) -> Tuple[jax.Array, Dict]:
        if self.proj_in_kernel is None:
            self.init_params(jax.random.PRNGKey(0))
        in_shape = z.shape
        if z.ndim > 3:  # (B, ..., C) → (B, tokens, C)
            z = z.reshape(in_shape[0], -1, in_shape[-1])
        z = z @ self.proj_in_kernel + self.proj_in_bias
        z_q, log = super().__call__(z, rng=rng)
        if self.output_dim is not None:
            z_q = z_q @ self.proj_out_kernel + self.proj_out_bias
            if len(in_shape) >= 4:
                z_q = z_q.reshape(*in_shape[:-1], self.output_dim)
        return z_q, log
