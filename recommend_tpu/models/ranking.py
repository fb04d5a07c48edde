"""Unified ranking transformer (OneTrans-capability).

Architecture (oneTrans model.py:26-416; paper translation:95-151):
tokenize [S; NS] → N pre-norm blocks with **mixed parameterization** (shared
Q/K/V/FFN weights for S-tokens, per-token dedicated stacks for the n_ns
NS-tokens) and **pyramid tail-query pruning** (per-layer keep-ratio; queries
are the tail of the sequence, K/V the full sequence) → RMSNorm → per-task MLP
heads on the last token.

TPU-first reformulations (SURVEY.md §7 phase 4):
  - The reference's per-token Python loops over projections
    (model.py:84-88, 153-162 — untraceable under tf.function) become stacked
    einsums: NS weights live as [n_ns, d, h, dh] / [n_ns, d, f] tensors and
    all NS tokens are projected in ONE `einsum('bnd,ndhk->bnhk')`.
  - The token layout is paper-correct [S; NS] (the reference inverts it,
    SURVEY.md O4). With the causal band mask this makes the whole S-side
    trunk independent of NS tokens, so the S K/V per layer can be computed
    once per request and reused across candidates and requests — the
    cross-candidate / cross-request KV cache (translation:144-151) — realized
    here by the `encode_s` / `score_with_cache` pair. The equivalence
    `full_call(x)[:, -n_ns:] == ns-path(cache)` is tested.
  - Pyramid keep-lengths are static Python ints (from config ratios), so XLA
    sees fixed shapes per layer; the band mask covers tail-queries-over-full-
    K/V exactly (`causal_band_mask(q_len, kv_len)`).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from recommend_tpu.config import RankingConfig
from recommend_tpu.models.tokenizer import UnifiedTokenizer
from recommend_tpu.ops.attention import (
    causal_band_mask,
    dot_product_attention,
    padding_mask_bias,
)
from recommend_tpu.ops.normalization import RMSNorm


def pyramid_keep_lengths(cfg: RankingConfig, total_len: int) -> List[int]:
    """Static per-layer kept-token counts (oneTrans PyramidScheduler,
    model.py:280-302). Ratios apply to the initial length; the kept window is
    never smaller than the NS block and never grows."""
    lens = []
    cur = total_len
    for r in cfg.pyramid_ratios:
        keep = max(int(round(total_len * r)), cfg.num_ns_tokens)
        keep = min(keep, cur)
        lens.append(keep)
        cur = keep
    return lens


class MixedBlock(nn.Module):
    """Pre-norm block with mixed shared(S)/dedicated(NS) parameterization.

    Three entry points share one parameter set:
      - ``full_call``: training/eval path over the whole [S; NS] stream with
        tail-query pruning.
      - ``s_call``: S-only trunk (shared weights), returning the S K/V for
        caching plus the pruned S output.
      - ``ns_call``: NS-only path consuming cached S K/V — the per-candidate
        serving hot path.
    """

    config: RankingConfig

    def setup(self):
        cfg = self.config
        d, h = cfg.embed_dim, cfg.num_heads
        dh = d // h
        n = cfg.num_ns_tokens
        f = cfg.ffn_dim
        pdt = jnp.dtype(cfg.param_dtype)
        init = nn.initializers.lecun_normal()

        cdt = jnp.dtype(cfg.active_compute_dtype)
        self.attn_norm = RMSNorm(name="attn_norm", param_dtype=pdt)
        self.ffn_norm = RMSNorm(name="ffn_norm", param_dtype=pdt)
        # shared (S-token) projections
        self.q_s = nn.DenseGeneral((h, dh), axis=-1, name="q_s", param_dtype=pdt, dtype=cdt)
        self.k_s = nn.DenseGeneral((h, dh), axis=-1, name="k_s", param_dtype=pdt, dtype=cdt)
        self.v_s = nn.DenseGeneral((h, dh), axis=-1, name="v_s", param_dtype=pdt, dtype=cdt)
        # dedicated per-NS-token stacks: [n, d, h, dh]
        self.q_ns = self.param("q_ns", init, (n, d, h * dh), pdt)
        self.k_ns = self.param("k_ns", init, (n, d, h * dh), pdt)
        self.v_ns = self.param("v_ns", init, (n, d, h * dh), pdt)
        self.o_proj = nn.DenseGeneral(d, axis=(-2, -1), name="o_proj", param_dtype=pdt, dtype=cdt)
        # shared FFN (GELU 2-layer, oneTrans model.py:131-141)
        self.ffn_s_in = nn.Dense(f, name="ffn_s_in", param_dtype=pdt, dtype=cdt)
        self.ffn_s_out = nn.Dense(d, name="ffn_s_out", param_dtype=pdt, dtype=cdt)
        # dedicated NS FFN stacks
        self.ffn_ns_in = self.param("ffn_ns_in", init, (n, d, f), pdt)
        self.ffn_ns_in_b = self.param("ffn_ns_in_b", nn.initializers.zeros, (n, f), pdt)
        self.ffn_ns_out = self.param("ffn_ns_out", init, (n, f, d), pdt)
        self.ffn_ns_out_b = self.param("ffn_ns_out_b", nn.initializers.zeros, (n, d), pdt)
        self.dropout = nn.Dropout(cfg.dropout_rate)

    # -- projection helpers ------------------------------------------------
    def _heads(self, x: jax.Array) -> jax.Array:
        h = self.config.num_heads
        return x.reshape(*x.shape[:-1], h, x.shape[-1] // h)

    def _proj_ns(self, w: jax.Array, x_ns: jax.Array) -> jax.Array:
        """[n,d,h·dh] stacked weights × [B,n,d] → [B,n,h,dh] — one einsum
        replacing the reference's per-token loop (oneTrans model.py:84-88)."""
        y = jnp.einsum(
            "bnd,ndk->bnk", x_ns, w.astype(x_ns.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x_ns.dtype)
        return self._heads(y)

    def _ffn_ns(self, x_ns: jax.Array) -> jax.Array:
        h = jnp.einsum(
            "bnd,ndf->bnf", x_ns, self.ffn_ns_in.astype(x_ns.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x_ns.dtype) + self.ffn_ns_in_b.astype(x_ns.dtype)
        h = jax.nn.gelu(h)
        return jnp.einsum(
            "bnf,nfd->bnd", h, self.ffn_ns_out.astype(x_ns.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x_ns.dtype) + self.ffn_ns_out_b.astype(x_ns.dtype)

    def _ffn_s(self, x: jax.Array) -> jax.Array:
        return self.ffn_s_out(jax.nn.gelu(self.ffn_s_in(x)))

    def _attend(
        self,
        q: jax.Array,  # [B, Lq, H, Dh]
        k: jax.Array,  # [B, Lkv, H, Dh]
        v: jax.Array,
        key_valid: jax.Array,  # [B, Lkv]
        q_offset: int,
    ) -> jax.Array:
        """Band attention: Pallas flash kernel when the flag is on and the
        query window is large enough to pay for it; jnp reference otherwise.
        Both paths compute the identical masked softmax (differentially
        tested in tests/test_flash_attention.py)."""
        cfg = self.config
        if cfg.use_flash_attention and q.shape[1] >= 64:
            from recommend_tpu.ops.pallas.flash_attention import (
                flash_attention_bhld,
            )

            return flash_attention_bhld(q, k, v, key_valid, q_offset, True)
        bias = (
            causal_band_mask(q.shape[1], k.shape[1], q_offset)[None, None]
            + padding_mask_bias(key_valid)
        )
        return dot_product_attention(q, k, v, bias)

    def _attend_mixed(
        self,
        q: jax.Array,       # [B, Lq, H, Dh] tail queries over [S; NS]
        k_s: jax.Array,     # [B, Ls, H, Dh]
        v_s: jax.Array,
        s_valid: jax.Array,  # [B, Ls]
        k_ns: jax.Array,    # [B, n, H, Dh]
        v_ns: jax.Array,
        q_offset: int,
    ) -> jax.Array:
        """Band attention over the segmented [S ; NS] key/value stream.

        The fused segmented-KV Pallas kernel joins the segments in VMEM, so
        the per-layer [B, L, H, Dh] K/V concatenates (a full-stream HBM copy
        each, profiled ~1 ms/layer fwd+bwd at bench shapes — docs/PERF.md)
        never materialize. Layers below the flash threshold fall back to the
        jnp path on the concatenated stream — their kept windows are tiny."""
        cfg = self.config
        if cfg.use_flash_attention and q.shape[1] >= 64:
            from recommend_tpu.ops.pallas.flash_attention import (
                flash_attention_bhld_segkv,
            )

            return flash_attention_bhld_segkv(
                q, k_s, v_s, k_ns, v_ns, s_valid, q_offset, True
            )
        b = q.shape[0]
        k = jnp.concatenate([k_s, k_ns], axis=1)
        v = jnp.concatenate([v_s, v_ns], axis=1)
        key_valid = jnp.concatenate(
            [s_valid, jnp.ones((b, k_ns.shape[1]), dtype=bool)], axis=1
        )
        bias = (
            causal_band_mask(q.shape[1], k.shape[1], q_offset)[None, None]
            + padding_mask_bias(key_valid)
        )
        return dot_product_attention(q, k, v, bias)

    # -- entry points ------------------------------------------------------
    def full_call(
        self,
        x: jax.Array,  # [B, L, d]; last n_ns tokens are NS
        s_len: int,
        keep_len: int,
        key_valid: jax.Array,  # [B, L]
        deterministic: bool = True,
    ) -> jax.Array:
        """Tail-`keep_len` queries over full-K/V; returns [B, keep_len, d]."""
        cfg = self.config
        n = cfg.num_ns_tokens
        b, l, d = x.shape
        assert s_len + n == l and n <= keep_len <= l
        hx = self.attn_norm(x)
        h_s, h_ns = hx[:, :s_len], hx[:, s_len:]
        k_s, v_s = self.k_s(h_s), self.v_s(h_s)
        k_ns = self._proj_ns(self.k_ns, h_ns)
        v_ns = self._proj_ns(self.v_ns, h_ns)
        keep_s = keep_len - n
        q_s_tail = self.q_s(h_s[:, s_len - keep_s :]) if keep_s > 0 else None
        q_ns = self._proj_ns(self.q_ns, h_ns)
        q = jnp.concatenate([q_s_tail, q_ns], axis=1) if q_s_tail is not None else q_ns
        attn = self._attend_mixed(
            q, k_s, v_s, key_valid[:, :s_len], k_ns, v_ns, l - keep_len
        )
        y = self.o_proj(attn)
        y = self.dropout(y, deterministic=deterministic)
        x = x[:, l - keep_len :] + y
        hx = self.ffn_norm(x)
        f_s = self._ffn_s(hx[:, :keep_s]) if keep_s > 0 else None
        f_ns = self._ffn_ns(hx[:, keep_s:])
        f = jnp.concatenate([f_s, f_ns], axis=1) if f_s is not None else f_ns
        f = self.dropout(f, deterministic=deterministic)
        return x + f

    def s_call(
        self,
        x_s: jax.Array,  # [B, Ls, d]
        keep_s: int,
        key_valid: jax.Array,  # [B, Ls]
        deterministic: bool = True,
    ) -> Tuple[Optional[jax.Array], jax.Array, jax.Array]:
        """S-only trunk step. Returns (pruned S output or None, k_s, v_s).
        k_s/v_s are the S keys/values of THIS layer's input — exactly what the
        full path computes, so they are cacheable for the NS path."""
        hx = self.attn_norm(x_s)
        k_s = self.k_s(hx)
        v_s = self.v_s(hx)
        if keep_s <= 0:
            return None, k_s, v_s
        ls = x_s.shape[1]
        q = self.q_s(hx[:, ls - keep_s :])
        attn = self._attend(q, k_s, v_s, key_valid, ls - keep_s)
        y = self.dropout(self.o_proj(attn), deterministic=deterministic)
        x = x_s[:, ls - keep_s :] + y
        f = self.dropout(self._ffn_s(self.ffn_norm(x)), deterministic=deterministic)
        return x + f, k_s, v_s

    def ns_call(
        self,
        x_ns: jax.Array,  # [B, n, d]
        k_s: Optional[jax.Array],  # [Bc, Ls, H, Dh] cached (Bc broadcastable)
        v_s: Optional[jax.Array],
        s_key_valid: Optional[jax.Array],  # [Bc, Ls]
        deterministic: bool = True,
    ) -> jax.Array:
        """NS-token path over cached S K/V — the per-candidate hot path."""
        b = x_ns.shape[0]
        hx = self.attn_norm(x_ns)
        q = self._proj_ns(self.q_ns, hx)
        k_ns = self._proj_ns(self.k_ns, hx)
        v_ns = self._proj_ns(self.v_ns, hx)
        if k_s is not None:
            k_s = jnp.broadcast_to(k_s, (b,) + k_s.shape[1:]).astype(k_ns.dtype)
            v_s = jnp.broadcast_to(v_s, (b,) + v_s.shape[1:]).astype(v_ns.dtype)
            k = jnp.concatenate([k_s, k_ns], axis=1)
            v = jnp.concatenate([v_s, v_ns], axis=1)
            key_valid = jnp.concatenate(
                [
                    jnp.broadcast_to(s_key_valid, (b, s_key_valid.shape[1])),
                    jnp.ones((b, x_ns.shape[1]), dtype=bool),
                ],
                axis=1,
            )
        else:
            k, v = k_ns, v_ns
            key_valid = jnp.ones((b, x_ns.shape[1]), dtype=bool)
        n, l = x_ns.shape[1], k.shape[1]
        bias = causal_band_mask(n, l)[None, None] + padding_mask_bias(key_valid)
        attn = dot_product_attention(q, k, v, bias)
        y = self.dropout(self.o_proj(attn), deterministic=deterministic)
        x = x_ns + y
        f = self.dropout(self._ffn_ns(self.ffn_norm(x)), deterministic=deterministic)
        return x + f


class RankingModel(nn.Module):
    config: RankingConfig

    def setup(self):
        cfg = self.config
        pdt = jnp.dtype(cfg.param_dtype)
        self.tokenizer = UnifiedTokenizer(cfg, name="tokenizer")
        # activation recompute (`use_remat`, oneTrans config.py:66-69 flag —
        # implemented here, unlike the reference) wraps each block's full path
        # static_argnums index the method's full arg list including self:
        # (self, x, s_len, keep_len, key_valid, deterministic)
        block_cls = (
            nn.remat(MixedBlock, static_argnums=(2, 3, 5), methods=("full_call",))
            if cfg.use_remat
            else MixedBlock
        )
        self.blocks = [
            block_cls(cfg, name=f"block_{i}") for i in range(cfg.num_layers)
        ]
        self.final_norm = RMSNorm(name="final_norm", param_dtype=pdt)
        bias0 = cfg.task_logit_bias_init or (0.0,) * len(cfg.tasks)
        self.heads = {
            t: [
                nn.Dense(cfg.task_head_hidden, name=f"head_{t}_hidden", param_dtype=pdt),
                # label-prior bias init (cfg.task_logit_bias_init): start at
                # the base-rate logit so epoch-1 gradients carry signal, not
                # the prior (the zero-bias drag measurably flips low-base-
                # rate runs into a stall basin — round-5 replica-v2 probes)
                nn.Dense(1, name=f"head_{t}_out", param_dtype=pdt,
                         bias_init=nn.initializers.constant(b0)),
            ]
            for t, b0 in zip(cfg.tasks, bias0)
        }

    def _apply_heads(self, last_token: jax.Array) -> Dict[str, jax.Array]:
        out = {}
        x32 = last_token.astype(jnp.float32)
        for t in self.config.tasks:
            hidden, final = self.heads[t]
            h = jax.nn.gelu(hidden(x32))
            out[t] = final(h)[..., 0]  # [B] logits
        return out

    def __call__(
        self,
        non_seq: Dict[str, jax.Array],
        sequences: Dict[str, jax.Array],
        seq_valid: Dict[str, jax.Array],
        deterministic: bool = True,
        dummies: Optional[Dict[str, jax.Array]] = None,
    ) -> Dict[str, jax.Array]:
        """Training/eval forward → per-task logits [B]. `dummies` routes
        embedding gradients to per-lookup arrays for sparse updates."""
        cfg = self.config
        x, valid = self.tokenizer(non_seq, sequences, seq_valid, dummies)
        total = x.shape[1]
        keeps = pyramid_keep_lengths(cfg, total)
        s_len = total - cfg.num_ns_tokens
        for blk, keep in zip(self.blocks, keeps):
            x = blk.full_call(x, s_len, keep, valid, deterministic)
            valid = valid[:, -keep:]
            s_len = keep - cfg.num_ns_tokens
        x = self.final_norm(x)
        return self._apply_heads(x[:, -1])

    # -- KV-cache serving decomposition -----------------------------------
    def embed_sequence_items(self, sf: str, ids: jax.Array) -> jax.Array:
        """Token vectors for items of one behavior sequence — the unit the
        cross-request session cache appends (ids [..., n] → [..., n, d]).
        Per-item and position-independent, so append-only caching is exact."""
        return self.tokenizer.seq_proj(self.tokenizer.item_embed(ids))

    def encode_s_tokens(
        self, s_tokens: jax.Array, s_valid: jax.Array
    ) -> List[Optional[Tuple[jax.Array, jax.Array, jax.Array]]]:
        """`encode_s` over precomputed S token vectors (cross-request path:
        the session cache supplies tokens, skipping re-embedding the whole
        history every request — translation:144-151's append-only Δ-update
        realized at the tokenizer level)."""
        cfg = self.config
        return self._encode_s_trunk(s_tokens, s_valid)

    def encode_s(
        self,
        sequences: Dict[str, jax.Array],
        seq_valid: Dict[str, jax.Array],
    ) -> List[Optional[Tuple[jax.Array, jax.Array, jax.Array]]]:
        """Phase 1 (once per request): run the S trunk, returning per-layer
        (k_s, v_s, s_key_valid) — the cross-candidate KV cache
        (translation:144-151)."""
        cfg = self.config
        if not any(f in sequences for f in cfg.sequence_features):
            # NS-only configs (Criteo): nothing to cache, every layer is a
            # pure NS pass
            return [None] * cfg.num_layers
        x, valid = self.tokenizer.s_tokens(sequences, seq_valid)
        return self._encode_s_trunk(x, valid)

    def _encode_s_trunk(
        self, x: jax.Array, valid: jax.Array
    ) -> List[Optional[Tuple[jax.Array, jax.Array, jax.Array]]]:
        cfg = self.config
        total = x.shape[1] + cfg.num_ns_tokens
        keeps = pyramid_keep_lengths(cfg, total)
        cache: List[Optional[Tuple[jax.Array, jax.Array, jax.Array]]] = []
        for blk, keep in zip(self.blocks, keeps):
            if x is None or x.shape[1] == 0:
                cache.append(None)
                continue
            keep_s = keep - cfg.num_ns_tokens
            y, k_s, v_s = blk.s_call(x, keep_s, valid)
            cache.append((k_s, v_s, valid))
            x = y
            if y is not None:
                valid = valid[:, -keep_s:]
        return cache

    def score_with_cache(
        self,
        cache: List[Optional[Tuple[jax.Array, jax.Array, jax.Array]]],
        non_seq: Dict[str, jax.Array],
    ) -> Dict[str, jax.Array]:
        """Phase 2 (per candidate batch): NS-only pass over cached S K/V.
        `non_seq` holds C candidate rows; the cache batch dim broadcasts."""
        x = self.tokenizer.ns_tokens(non_seq)
        for blk, entry in zip(self.blocks, cache):
            if entry is None:
                x = blk.ns_call(x, None, None, None)
            else:
                k_s, v_s, s_valid = entry
                x = blk.ns_call(x, k_s, v_s, s_valid)
        x = self.final_norm(x)
        return self._apply_heads(x[:, -1])

    # -- cross-request Δ-append session cache ------------------------------
    #
    # The paper's cross-request cache (translation:144-151, Table 5 :252:
    # −29.6% p99 / −52.9% memory) reuses per-layer S-side K/V across requests
    # and appends only the Δ new behavior items. Realization here, TPU-first
    # (static shapes throughout):
    #
    #   session state = refresh cache (encode_s output: per-layer k/v/valid
    #   at a refresh point) + per-layer EXTENSION buffers
    #   [n_layers, 1, SLACK, H, Dh] with one shared count.
    #
    #   extend_s_cache runs ONE trunk step over only the Δ new tokens per
    #   layer — O(Δ·window) instead of O(window²) per request.
    #
    # Exactness (frozen-window semantics): under the causal mask, appended
    # tokens cannot change earlier positions' K/V, so the append is exact
    # with respect to the forward whose per-layer pyramid windows are FROZEN
    # at the refresh point and grow at the tail. When pyramid pruning is
    # inactive (keep ratios ≥ 1, or stream shorter than every keep length)
    # this equals the true full forward bit-for-bit (tested). With pruning
    # active, entries drift from a fresh full forward only through window
    # anchoring (old keys that a re-pruned forward would have dropped); the
    # serving engine refreshes periodically (SLACK exhaustion), restoring
    # bit-exactness with `score_request` at every refresh point.

    def extend_s_cache(
        self,
        cache: List[Optional[Tuple[jax.Array, jax.Array, jax.Array]]],
        ext_k: jax.Array,  # [n_layers, 1, SLACK, H, Dh]
        ext_v: jax.Array,
        count: jax.Array,  # scalar int32: filled extension slots
        x_new: jax.Array,  # [1, Db, d] token vectors of appended items
        new_valid: jax.Array,  # [1, Db] bool; valid packed at the front
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """One Δ-append trunk step. Returns (ext_k, ext_v, count) updated —
        the new tokens' per-layer K/V written at [count : count+Db] (garbage
        in padded slots is masked by count until overwritten)."""
        slack = ext_k.shape[2]
        ext_valid = (jnp.arange(slack)[None, :] < count)  # [1, SLACK]
        x = x_new
        new_ext_k, new_ext_v = ext_k, ext_v
        n_layers = len(self.blocks)
        for i, (blk, entry) in enumerate(zip(self.blocks, cache)):
            if entry is None:
                # the refresh trunk ended here (keep_s hit 0) or the config
                # has no S stream: the canonical pruned forward has NO S
                # tokens at this layer and the block has no S-side q/FFN
                # parameters — stop extending
                break
            hx = blk.attn_norm(x)
            k_n = blk.k_s(hx)
            v_n = blk.v_s(hx)
            new_ext_k = jax.lax.dynamic_update_slice(
                new_ext_k, k_n[None].astype(new_ext_k.dtype), (i, 0, count, 0, 0)
            )
            new_ext_v = jax.lax.dynamic_update_slice(
                new_ext_v, v_n[None].astype(new_ext_v.dtype), (i, 0, count, 0, 0)
            )
            # the layer's OUTPUT for the new tokens is only needed as the
            # next layer's input — and q_s/FFN params only exist for layers
            # whose keep_s was > 0 (exactly those with a next-layer cache)
            if i + 1 >= n_layers or cache[i + 1] is None:
                break
            q = blk.q_s(hx)
            k0, v0, sv0 = entry  # non-None: the loop breaks on None above
            k = jnp.concatenate(
                [k0.astype(k_n.dtype), ext_k[i].astype(k_n.dtype), k_n], axis=1
            )
            v = jnp.concatenate(
                [v0.astype(v_n.dtype), ext_v[i].astype(v_n.dtype), v_n], axis=1
            )
            kv_valid = jnp.concatenate([sv0, ext_valid, new_valid], axis=1)
            off = slack + k0.shape[1]
            attn = blk._attend(q, k, v, kv_valid, off)
            x = x + blk.o_proj(attn)
            x = x + blk._ffn_s(blk.ffn_norm(x))
        n_new = jnp.sum(new_valid.astype(jnp.int32))
        return new_ext_k, new_ext_v, count + n_new

    def pad_s_cache(
        self,
        cache: List[Optional[Tuple[jax.Array, jax.Array, jax.Array]]],
        pad_rows: int,
    ) -> List[Optional[Tuple[jax.Array, jax.Array, jax.Array]]]:
        """Append ``pad_rows`` invalid rows to every layer's cached K/V —
        pre-allocated space that `compact_s_cache` later fills in place. The
        session cache thus keeps ONE static shape across its whole
        refresh → append → compact lifecycle (XLA compiles each serving path
        exactly once; masked rows cost only masked-attention FLOPs)."""
        out: List[Optional[Tuple[jax.Array, jax.Array, jax.Array]]] = []
        for entry in cache:
            if entry is None:
                out.append(None)
                continue
            k0, v0, sv0 = entry
            b = sv0.shape[0]
            zk = jnp.zeros(
                (k0.shape[0], pad_rows) + k0.shape[2:], dtype=k0.dtype
            )
            out.append((
                jnp.concatenate([k0, zk], axis=1),
                jnp.concatenate([v0, zk.astype(v0.dtype)], axis=1),
                jnp.concatenate(
                    [sv0, jnp.zeros((b, pad_rows), dtype=bool)], axis=1
                ),
            ))
        return out

    def compact_s_cache(
        self,
        cache: List[Optional[Tuple[jax.Array, jax.Array, jax.Array]]],
        ext_k: jax.Array,
        ext_v: jax.Array,
        count: jax.Array,
        level: jax.Array,
        pad_rows: int,
    ) -> List[Optional[Tuple[jax.Array, jax.Array, jax.Array]]]:
        """Fold full extension buffers into the base cache WITHOUT any trunk
        recompute: per layer the extension's SLACK rows (validity-masked
        beyond ``count``) are written into the cache's pre-allocated padding
        (`pad_s_cache`) at slot ``level`` — a `dynamic_update_slice`, so the
        shape never changes and every serving path keeps ONE compiled
        variant. K/V entries are frozen (append-only cache semantics,
        translation:144-151), so this is an EXACT identity on scoring — one
        cheap device copy that frees the buffer for the next O(Δ) appends.
        The serving engine re-anchors with a full `encode_s` after the
        padding fills (`pad_rows // SLACK` compactions), capping
        frozen-window drift."""
        slack = ext_k.shape[2]
        ext_valid = jnp.arange(slack)[None, :] < count  # [1, SLACK]
        out: List[Optional[Tuple[jax.Array, jax.Array, jax.Array]]] = []
        for i, entry in enumerate(cache):
            if entry is None:
                out.append(None)
                continue
            k0, v0, sv0 = entry
            b = sv0.shape[0]
            base_len = k0.shape[1] - pad_rows  # static per layer
            off = base_len + level * slack
            k = jax.lax.dynamic_update_slice(
                k0, ext_k[i].astype(k0.dtype), (0, off, 0, 0)
            )
            v = jax.lax.dynamic_update_slice(
                v0, ext_v[i].astype(v0.dtype), (0, off, 0, 0)
            )
            sv = jax.lax.dynamic_update_slice(
                sv0, jnp.broadcast_to(ext_valid, (b, slack)), (0, off)
            )
            out.append((k, v, sv))
        return out

    def score_with_cache_ext(
        self,
        cache: List[Optional[Tuple[jax.Array, jax.Array, jax.Array]]],
        ext_k: jax.Array,
        ext_v: jax.Array,
        count: jax.Array,
        non_seq: Dict[str, jax.Array],
    ) -> Dict[str, jax.Array]:
        """`score_with_cache` over refresh cache + extension buffers: the
        NS path's S keys per layer are [refresh K/V ; extension[:count]]."""
        x = self.tokenizer.ns_tokens(non_seq)
        slack = ext_k.shape[2]
        ext_valid = (jnp.arange(slack)[None, :] < count)  # [1, SLACK]
        for i, (blk, entry) in enumerate(zip(self.blocks, cache)):
            if entry is None:
                # no S stream at this layer (trunk ended / NS-only config);
                # the extension is never written past the trunk end, so its
                # zero rows must not be attended either
                x = blk.ns_call(x, None, None, None)
                continue
            k0, v0, sv0 = entry
            ke, ve = ext_k[i], ext_v[i]
            k_s = jnp.concatenate([k0, ke.astype(k0.dtype)], axis=1)
            v_s = jnp.concatenate([v0, ve.astype(v0.dtype)], axis=1)
            sv = jnp.concatenate(
                [sv0, jnp.broadcast_to(ext_valid, (sv0.shape[0], slack))],
                axis=1,
            )
            x = blk.ns_call(x, k_s, v_s, sv)
        x = self.final_norm(x)
        return self._apply_heads(x[:, -1])

    def param_count(self, params) -> int:
        return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))

    def get_model_info(self, params, s_len: int = 350) -> Dict[str, object]:
        """Model card (oneTrans get_model_info, model.py:399-408): parameter
        counts split dense vs embedding, plus analytic per-sample FLOPs."""
        from recommend_tpu.evaluation.benchmark import ranking_model_flops

        emb = 0
        for path, leaf in jax.tree_util.tree_leaves_with_path(params):
            keys = [getattr(p, "key", "") for p in path]
            if keys and keys[-1] == "embedding":
                emb += int(leaf.size)
        total = self.param_count(params)
        return {
            "total_params": total,
            "embedding_params": emb,
            "dense_params": total - emb,
            "num_layers": self.config.num_layers,
            "embed_dim": self.config.embed_dim,
            "num_ns_tokens": self.config.num_ns_tokens,
            "pyramid_ratios": list(self.config.pyramid_ratios),
            "forward_gflops_per_sample": round(
                ranking_model_flops(self.config, s_len) / 1e9, 3
            ),
        }
