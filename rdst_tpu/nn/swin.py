"""Swin transformer core ops (NHWC / token layouts, trace-time masks).

TPU-first re-design of the reference Swin foundation
(/root/reference/networks/swin_transformer_sr.py:32-409):

* window partition/reverse are pure reshapes+transposes on NHWC;
* the relative-position bias index and the shifted-window attention
  mask are computed **with numpy at trace time** from static shapes —
  no data-dependent control flow reaches XLA, and arbitrary inference
  resolutions simply trace a new (cached) program per shape bucket
  (replaces the reference's runtime mask recompute, :253-257);
* attention is batched dense matmuls over (B·nW, heads, N, N) with
  N = window² = 64 — small per-window, but the window-batch dimension
  is large so XLA tiles it onto the MXU efficiently. A fused Pallas
  kernel is wired behind `rdst_tpu.kernels.window_attention`.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rdst_tpu.nn.layers import DropPath, LayerNorm, Mlp, trunc_normal_init


def window_partition(x: jax.Array, window_size: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, ws, ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window_size, window_size, w // window_size, window_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window_size, window_size, c)


def window_reverse(windows: jax.Array, window_size: int, h: int, w: int) -> jax.Array:
    """(B*nW, ws, ws, C) -> (B, H, W, C)."""
    b = windows.shape[0] // (h * w // window_size // window_size)
    x = windows.reshape(b, h // window_size, w // window_size, window_size, window_size, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


@functools.lru_cache(maxsize=64)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """Pairwise relative-position index (wh*ww, wh*ww) into the bias table.

    Same construction as the reference (swin_transformer_sr.py:88-99), so
    imported bias tables line up element-for-element.
    """
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=256)
def shift_attention_mask(h: int, w: int, window_size: int, shift: int) -> Optional[np.ndarray]:
    """SW-MSA mask (nW, N, N) with 0 / -100 entries; None when shift == 0.

    Built on the host from static shapes (the 9-region construction of
    swin_transformer_sr.py:211-232).
    """
    if shift == 0:
        return None
    img_mask = np.zeros((h, w))
    slices = (slice(0, -window_size), slice(-window_size, -shift), slice(-shift, None))
    cnt = 0
    for hs in slices:
        for ws_ in slices:
            img_mask[hs, ws_] = cnt
            cnt += 1
    m = img_mask.reshape(h // window_size, window_size, w // window_size, window_size)
    m = m.transpose(0, 2, 1, 3).reshape(-1, window_size * window_size)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def resolve_ws_shift(decide_res: Tuple[int, int], h: int, w: int,
                     ws: int, shift: int) -> Tuple[int, int]:
    """The reference's constructor-time clamp (swin_transformer_sr.py:
    188-191): window larger than the (build) input -> no partitioning,
    no shift; then never exceed the runtime extent."""
    if min(decide_res) <= ws:
        shift = 0
        ws = min(decide_res)
    ws = min(ws, h, w)
    if shift >= ws:  # runtime extent shrank the window below the shift
        shift = 0
    return ws, shift


class _LinearParams(nn.Module):
    """Declares kernel/bias at the same tree path as nn.Dense would."""

    features_in: int
    features_out: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", trunc_normal_init,
                            (self.features_in, self.features_out))
        bias = (self.param("bias", nn.initializers.zeros, (self.features_out,))
                if self.use_bias else None)
        return kernel, bias


class _LayerNormParams(nn.Module):
    """Declares scale/bias at the same tree path as nn.LayerNorm."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


class _MlpParams(nn.Module):
    """Declares fc1/fc2 kernels+biases at the same tree path as Mlp."""

    features_in: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1, b1 = _LinearParams(self.features_in, self.hidden, True, name="fc1")()
        w2, b2 = _LinearParams(self.hidden, self.features_in, True, name="fc2")()
        return w1, b1, w2, b2


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (swin_transformer_sr.py:62-141)."""

    dim: int
    window_size: Tuple[int, int]
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, deterministic: bool = True,
                 params_only: bool = False):
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim**-0.5

        bias_table = self.param(
            "relative_position_bias_table",
            trunc_normal_init,
            ((2 * self.window_size[0] - 1) * (2 * self.window_size[1] - 1), self.num_heads),
        )
        wqkv, bqkv = _LinearParams(self.dim, self.dim * 3, self.qkv_bias,
                                   name="qkv")()
        wproj, bproj = _LinearParams(self.dim, self.dim, True, name="proj")()
        if params_only:
            # fused-kernel path: the block consumes the raw parameters
            # (identical tree to the XLA path; x is ignored)
            return bias_table, wqkv, bqkv, wproj, bproj
        b_, n, c = x.shape

        idx = relative_position_index(*self.window_size).reshape(-1)
        rel_bias = bias_table[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)

        # (modes '1'/'block' — the round-1 attention-only and
        # qkv+attn+proj kernels — were retired in r3 after a second
        # negative measurement: 377/504 slices/s vs 669 XLA and 2884
        # mega-kernel. They now fall through to this XLA path; PERF.md
        # keeps the record.)
        qkv = x.astype(self.dtype) @ wqkv.astype(self.dtype)
        if bqkv is not None:
            qkv = qkv + bqkv.astype(self.dtype)
        qkv = qkv.reshape(b_, n, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * scale) @ k.transpose(0, 1, 3, 2)  # (B_, nH, N, N)
        attn = attn + rel_bias[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(-1, self.num_heads, n, n)
        if os.environ.get("RDST_TPU_LOGIT_AUDIT"):
            # logit audit (trace-time gate): sow this layer's max
            # attention logit — the statistic pallas_softmax='auto'
            # judges the clamp variant against (kernels/logit_audit.py;
            # masked positions sit at ~-100 and never win the max)
            self.sow("intermediates", "attn_logit_max",
                     jnp.max(attn).astype(jnp.float32),
                     init_fn=lambda: jnp.float32(-jnp.inf),
                     reduce_fn=jnp.maximum)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        y = (attn @ v).transpose(0, 2, 1, 3).reshape(b_, n, c)
        y = y @ wproj.astype(self.dtype) + bproj.astype(self.dtype)
        return nn.Dropout(self.proj_drop)(y, deterministic=deterministic)


class SwinTransformerBlock(nn.Module):
    """Pre-LN block: (shifted) W-MSA + MLP, both residual
    (swin_transformer_sr.py:160-274). Token input (B, L, C) + static x_size.
    """

    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    # Build-time resolution for the shift/window clamp decision. The
    # reference decides `if min(input_resolution) <= window_size: shift=0,
    # ws=min(res)` in the CONSTRUCTOR from the configured img_size
    # (swin_transformer_sr.py:188-191) — notably SwinIR's factory shrinks
    # img_size to (lr_patch//scale//ws+1)*ws, permanently disabling shifts.
    # None = decide from the runtime x_size.
    build_resolution: Optional[Tuple[int, int]] = None
    layer_norm: bool = True  # False = the reference's norm_layer=Identity
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_size: Tuple[int, int], deterministic: bool = True,
                 params_only: bool = False):
        h, w = x_size
        ws, shift = resolve_ws_shift(self.build_resolution or (h, w), h, w,
                                     self.window_size, self.shift_size)
        if params_only:
            # kernel-input bundle for a caller-side fused kernel (the
            # DSTL pair path in BasicLayer); declares the exact same
            # parameter tree as computing would
            return self._kernel_inputs((h, w), ws, shift)
        b, l, c = x.shape

        from rdst_tpu.kernels import window_attention as wa
        from rdst_tpu.kernels.swin_block import fused_block_fits

        use_fused = (
            wa.pallas_mode() in ("swin", "pair", "pack", "rdstb")
            and deterministic
            and self.layer_norm and self.qk_scale is None
            and c % self.num_heads == 0
            and h % ws == 0 and w % ws == 0
            and fused_block_fits(
                (h // ws) * (w // ws), ws * ws, c, self.num_heads,
                int(self.dim * self.mlp_ratio),
                jnp.dtype(self.dtype).itemsize)
            and (jax.default_backend() == "tpu" or wa.pallas_interpret())
        )
        if use_fused:
            return self._fused_block(x, (h, w), ws, shift,
                                     interpret=wa.pallas_interpret())

        # differentiable SINGLE-block kernel in the TRAINING step
        # (kernels/block_train.py): engages when pallas_train is on but
        # the DSTL-pair kernel self-gated OFF upstream (BasicLayer takes
        # pairs first when they fit) — i.e. big-C geometries like
        # SwinIR-std C=180 where the pair's backward working set exceeds
        # VMEM, or odd depths. Window-chunked grids admit any C.
        # 'block' forces single-block granularity even where pairs fit
        # (A/B measurement).
        from rdst_tpu.kernels.block_train import fused_block_train_fits

        use_fused_train = (
            not deterministic
            and wa.pallas_train_mode() in ("pair", "block")
            and self.layer_norm and self.qk_scale is None
            and self.drop == 0.0 and self.attn_drop == 0.0
            and c % self.num_heads == 0
            and h % ws == 0 and w % ws == 0
            and fused_block_train_fits(
                (h // ws) * (w // ws), ws * ws, c, self.num_heads,
                int(self.dim * self.mlp_ratio),
                jnp.dtype(self.dtype).itemsize)
            and (jax.default_backend() == "tpu" or wa.pallas_interpret())
        )
        if use_fused_train:
            return self._fused_block(x, (h, w), ws, shift,
                                     interpret=wa.pallas_interpret(),
                                     train=True)

        shortcut = x
        if self.layer_norm:
            x = LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x.reshape(b, h, w, c)

        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))

        x_windows = window_partition(x, ws).reshape(-1, ws * ws, c)

        mask = shift_attention_mask(h, w, ws, shift)
        mask = jnp.asarray(mask) if mask is not None else None
        attn_windows = WindowAttention(
            dim=self.dim, window_size=(ws, ws), num_heads=self.num_heads,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            attn_drop=self.attn_drop, proj_drop=self.drop,
            dtype=self.dtype, name="attn",
        )(x_windows, mask, deterministic)

        x = window_reverse(attn_windows.reshape(-1, ws, ws, c), ws, h, w)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x.reshape(b, h * w, c)

        drop_path = DropPath(self.drop_path)
        x = shortcut + drop_path(x, deterministic)
        xn = (LayerNorm(dtype=self.dtype, name="norm2")(x)
              if self.layer_norm else x)
        y = Mlp(hidden_features=int(self.dim * self.mlp_ratio), drop=self.drop,
                dtype=self.dtype, name="mlp")(xn, deterministic)
        return x + drop_path(y, deterministic)

    def _block_dp_cols(self, b: int, rows_per_image: int):
        """(B·nW·N, 2) stochastic-depth factor columns [attn, mlp] for
        THIS block — the in-kernel equivalent of two independent
        DropPath draws (nn/layers.py:60: per-sample bernoulli(keep),
        kept branches scaled 1/keep). None at rate 0."""
        if not self.drop_path:
            return None
        keep = 1.0 - self.drop_path
        cols = []
        for _ in range(2):
            m = jax.random.bernoulli(self.make_rng("droppath"), keep, (b,))
            cols.append(jnp.where(m, 1.0 / keep, 0.0))
        return jnp.repeat(jnp.stack(cols, -1), rows_per_image, axis=0)

    def _kernel_inputs(self, x_size, ws: int, shift: int):
        """Declare this block's parameter tree (checkpoint-identical to
        the XLA path) and return (params 12-tuple, combined bias).

        bias: (nH·nW, N, N) rel-pos + shift mask when shifted, else the
        per-window-shared (nH, N, N) rel-pos alone (nW× less VMEM in the
        kernels). In compute dtype: the XLA path also adds it at
        attn.dtype, and f32 costs 2x VMEM in the kernel."""
        h, w = x_size
        c = self.dim
        n = ws * ws
        dt = self.dtype

        gamma1, beta1 = _LayerNormParams(c, name="norm1")()
        table, wqkv, bqkv, wproj, bproj = WindowAttention(
            dim=self.dim, window_size=(ws, ws), num_heads=self.num_heads,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            attn_drop=self.attn_drop, proj_drop=self.drop,
            dtype=dt, name="attn",
        )(None, params_only=True)
        gamma2, beta2 = _LayerNormParams(c, name="norm2")()
        w1, bf1, w2, bf2 = _MlpParams(c, int(self.dim * self.mlp_ratio),
                                      name="mlp")()

        idx = relative_position_index(ws, ws).reshape(-1)
        rel_bias = table[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)
        mask = shift_attention_mask(h, w, ws, shift)
        if mask is not None:
            nw = (h // ws) * (w // ws)
            bias = (rel_bias[:, None] + jnp.asarray(mask)[None]
                    ).reshape(self.num_heads * nw, n, n)
        else:
            bias = rel_bias  # (nH, N, N): shared by every window
        params = (wqkv, bqkv, wproj, bproj, gamma1, beta1, gamma2, beta2,
                  w1, bf1, w2, bf2)
        return params, bias.astype(dt)

    def _fused_block(self, x, x_size, ws: int, shift: int, *,
                     interpret: bool = False, train: bool = False):
        """Fused-kernel path: the whole block body runs in one Pallas
        kernel on window-layout tokens (kernels/swin_block.py; with
        train=True the differentiable custom_vjp twin,
        kernels/block_train.py — forward AND backward fused); XLA keeps
        only roll/partition/reverse. Declares the exact same parameter
        tree as the XLA path (checkpoint-compatible)."""
        from rdst_tpu.kernels.swin_block import fused_swin_block

        h, w = x_size
        b, l, c = x.shape
        dt = self.dtype
        params, bias = self._kernel_inputs(x_size, ws, shift)
        (wqkv, bqkv, wproj, bproj, gamma1, beta1, gamma2, beta2,
         w1, bf1, w2, bf2) = params
        nw = (h // ws) * (w // ws)

        xi = x.reshape(b, h, w, c)
        if shift > 0:
            xi = jnp.roll(xi, (-shift, -shift), axis=(1, 2))
        x_windows = window_partition(xi, ws).reshape(-1, ws * ws, c)

        import os

        from rdst_tpu.kernels import window_attention as wa

        ipp = int(os.environ.get("RDST_TPU_PALLAS_IPP", "2"))
        if train:
            from rdst_tpu.kernels.block_train import fused_swin_block_train

            y = fused_swin_block_train(
                x_windows.astype(dt), params, bias,
                self._block_dp_cols(b, nw * ws * ws),
                num_heads=self.num_heads, windows_per_image=nw,
                images_per_program=ipp, interpret=interpret)
            y = window_reverse(y.reshape(-1, ws, ws, c), ws, h, w)
            if shift > 0:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))
            return y.reshape(b, l, c)
        # 'pack' mode: narrow-channel blocks (2C fits one 128-lane tile)
        # run two windows per lane row for ~2x VPU/MXU fill
        pack = 2 if (wa.pallas_mode() == "pack" and c <= 64) else 1
        from rdst_tpu.kernels.swin_block import quant_flags

        y = fused_swin_block(
            x_windows.astype(dt),
            wqkv.astype(dt), None if bqkv is None else bqkv.astype(dt),
            wproj.astype(dt), bproj.astype(dt),
            gamma1.astype(jnp.float32), beta1.astype(jnp.float32),
            gamma2.astype(jnp.float32), beta2.astype(jnp.float32),
            w1.astype(dt), bf1.astype(dt), w2.astype(dt), bf2.astype(dt),
            bias, num_heads=self.num_heads, windows_per_image=nw,
            images_per_program=ipp, pack=pack, interpret=interpret,
            # resolved HERE so the jit cache keys on the active flags
            quant=quant_flags())

        y = window_reverse(y.reshape(-1, ws, ws, c), ws, h, w)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        return y.reshape(b, l, c)


class BasicLayer(nn.Module):
    """Stack of depth blocks, alternating shift 0 / ws//2
    (swin_transformer_sr.py:343-398)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Tuple[float, ...] = ()
    use_checkpoint: bool = False
    build_resolution: Optional[Tuple[int, int]] = None
    layer_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    def _block(self, i: int, dp: float = 0.0) -> "SwinTransformerBlock":
        return SwinTransformerBlock(
            dim=self.dim, num_heads=self.num_heads, window_size=self.window_size,
            shift_size=0 if i % 2 == 0 else self.window_size // 2,
            mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            drop=self.drop, attn_drop=self.attn_drop, drop_path=dp,
            build_resolution=self.build_resolution, layer_norm=self.layer_norm,
            dtype=self.dtype, name=f"blocks_{i}",
        )

    @nn.compact
    def __call__(self, x, x_size, deterministic: bool = True,
                 params_only: bool = False):
        h, w = x_size
        if params_only:
            # kernel-input bundles for every block (the fused-RDSTB path)
            return [self._block(i)(None, x_size, params_only=True)
                    for i in range(self.depth)]
        c = x.shape[-1]
        from rdst_tpu.kernels import window_attention as wa
        from rdst_tpu.kernels.swin_block import fused_pair_fits, use_fast_path

        ws, shift = resolve_ws_shift(self.build_resolution or (h, w), h, w,
                                     self.window_size, self.window_size // 2)
        def pair_eligible(fits):
            """Geometry/structure gate shared by the inference and
            training pair kernels; `fits` is the mode's VMEM check."""
            return (self.layer_norm
                    and self.depth % 2 == 0 and not self.use_checkpoint
                    and self.qk_scale is None and use_fast_path(self.dtype)
                    and c % self.num_heads == 0
                    and h % ws == 0 and w % ws == 0
                    and fits((h // ws) * (w // ws), ws * ws, c,
                             self.num_heads, int(self.dim * self.mlp_ratio),
                             jnp.dtype(self.dtype).itemsize)
                    and (jax.default_backend() == "tpu"
                         or wa.pallas_interpret()))

        use_pair = (
            wa.pallas_mode() in ("pair", "rdstb") and deterministic
            and pair_eligible(fused_pair_fits)
        )
        if use_pair:
            for i in range(0, self.depth, 2):
                x = self._fused_pair(x, x_size, i, ws, shift,
                                     interpret=wa.pallas_interpret())
            return x

        # differentiable pair kernel in the TRAINING step (opt-in via
        # RDST_TPU_PALLAS_TRAIN=pair / config pallas_train; needs the
        # bf16 fast path, i.e. training_dtype='bfloat16'): forward AND
        # backward run fused in VMEM (kernels/pair_train.py); DropPath
        # rides in-kernel factor columns, so the flagship recipe's
        # drop_path 0.1 is supported; plain Dropout is not (rates 0 in
        # every shipped config)
        from rdst_tpu.kernels.pair_train import fused_pair_train_fits

        use_pair_train = (
            not deterministic
            and wa.pallas_train_mode() == "pair"
            and self.drop == 0.0 and self.attn_drop == 0.0
            and pair_eligible(fused_pair_train_fits)
        )
        if use_pair_train:
            for i in range(0, self.depth, 2):
                x = self._fused_pair(x, x_size, i, ws, shift,
                                     interpret=wa.pallas_interpret(),
                                     train=True)
            return x

        for i in range(self.depth):
            dp = self.drop_path[i] if self.drop_path else 0.0
            block = self._block(i, dp)
            if self.use_checkpoint:
                # x_size / deterministic must stay static under remat or
                # tracing fails on the bool/int conversions
                x = nn.remat(
                    SwinTransformerBlock.__call__,
                    static_argnums=(2, 3),
                )(block, x, x_size, deterministic)
            else:
                x = block(x, x_size, deterministic)
        return x

    def _dp_factor_cols(self, b: int, rows_per_image: int, i: int):
        """(B·nW·N, 4) stochastic-depth factor columns [attn_a, mlp_a,
        attn_b, mlp_b] for blocks i/i+1 — the in-kernel equivalent of
        four independent DropPath draws (nn/layers.py:60: per-sample
        bernoulli(keep), kept branches scaled 1/keep). None when both
        blocks' rates are 0."""
        dpa = self.drop_path[i] if self.drop_path else 0.0
        dpb = self.drop_path[i + 1] if self.drop_path else 0.0
        if dpa == 0.0 and dpb == 0.0:
            return None
        cols = []
        for r in (dpa, dpa, dpb, dpb):
            if r == 0.0:
                cols.append(jnp.ones((b,), jnp.float32))
            else:
                keep = 1.0 - r
                m = jax.random.bernoulli(self.make_rng("droppath"), keep, (b,))
                cols.append(jnp.where(m, 1.0 / keep, 0.0))
        return jnp.repeat(jnp.stack(cols, -1), rows_per_image, axis=0)

    def _fused_pair(self, x, x_size, i: int, ws: int, shift: int, *,
                    interpret: bool = False, train: bool = False):
        """One DSTL pair (blocks i, i+1) through the fused pair kernel:
        the inter-block reverse/roll/partition happens in VMEM
        (kernels/swin_block.fused_swin_pair). Entry partition and exit
        reverse(+roll) stay in XLA — the same glue ONE block pays, so
        per pair one whole HBM round-trip + relayout copy is saved.
        Declares both blocks' parameter trees (checkpoint-compatible)."""
        from rdst_tpu.kernels.swin_block import fused_swin_pair

        h, w = x_size
        b, l, c = x.shape
        params_a, bias_a = self._block(i)(None, x_size, params_only=True)
        params_b, bias_b = self._block(i + 1)(None, x_size, params_only=True)

        x_windows = window_partition(
            x.reshape(b, h, w, c), ws).reshape(-1, ws * ws, c)

        import os

        ipp = int(os.environ.get("RDST_TPU_PALLAS_IPP", "2"))
        if train:
            from rdst_tpu.kernels.pair_train import fused_swin_pair_train

            nw = (h // ws) * (w // ws)
            y = fused_swin_pair_train(
                x_windows.astype(self.dtype), params_a, bias_a,
                params_b, bias_b,
                self._dp_factor_cols(b, nw * ws * ws, i),
                num_heads=self.num_heads, x_size=(h, w), window_size=ws,
                shift=shift, images_per_program=ipp, interpret=interpret)
        else:
            from rdst_tpu.kernels.swin_block import quant_flags

            y = fused_swin_pair(
                x_windows.astype(self.dtype), params_a, bias_a,
                params_b, bias_b,
                num_heads=self.num_heads, x_size=(h, w), window_size=ws,
                shift=shift, images_per_program=ipp, interpret=interpret,
                # resolved HERE so the jit cache keys on the active flags
                quant=quant_flags())

        # y is in SHIFTED window layout: one fused XLA exit copy undoes it
        y = window_reverse(y.reshape(-1, ws, ws, c), ws, h, w)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        return y.reshape(b, l, c)


class PatchMerging(nn.Module):
    """2x2 concat + linear reduction (discriminator path,
    swin_transformer_sr.py:295-331)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_size):
        h, w = x_size
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        ).reshape(b, -1, 4 * c)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="reduction")(x)
        return x
