"""Flash attention for TPU (Pallas) with an XLA reference path.

The reference's hot loop is DINOv2 ViT-g attention over ~1k–16k tokens per
slice through xformers CUDA kernels (SURVEY.md §3.3). This is the
TPU-native equivalent: an online-softmax flash kernel that never
materializes the (N×N) score matrix in HBM.

Kernel layout:
- grid = (batch·heads, query blocks); each program holds one query block in
  VMEM and streams key/value blocks from the full per-(batch·head) K/V
  (which fit comfortably in VMEM for ViT sequence lengths: 16k × 64 × bf16
  = 2 MB),
- scores and the softmax running state (m, l, acc) accumulate in f32 on the
  MXU (``preferred_element_type``), inputs stay bf16,
- sequence padding to the block quantum is handled by masking padded *keys*
  with −∞ before the max/exp; padded queries are sliced off outside.

The XLA path (:func:`attention_reference`) is the numerics oracle and the
CPU/interpret fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "flash_attention",
    "flash_attention_bhnd",
    "flash_attention_pairs",
    "attention_reference",
]

NEG_INF = -1e30


def attention_reference(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """XLA attention oracle. q/k/v: ``(B, N, H, D)`` → ``(B, N, H, D)``."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, kv_len: int, scale: float):
    # keep q/k in their storage dtype (bf16): the MXU multiplies bf16×bf16
    # with f32 accumulation at full rate, while upcasting inputs to f32
    # first would force a ~4× slower full-f32 matmul (measured: attention
    # dropped from 45% to ~15% of ViT-g runtime with this layout)
    q = q_ref[0]  # (BQ, D)
    block_q, head_dim = q.shape
    kv_pad = k_ref.shape[1]
    num_kb = kv_pad // block_k

    m0 = jnp.full((block_q,), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((block_q,), dtype=jnp.float32)
    acc0 = jnp.zeros((block_q, head_dim), dtype=jnp.float32)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        kb = k_ref[0, pl.ds(i * block_k, block_k), :]
        vb = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q,
            kb,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BQ, BK) f32 accumulated
        # mask keys beyond the true sequence length
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[:, None])
        correction = jnp.exp(m_prev - m_new)
        l_new = l_prev * correction + jnp.sum(p, axis=-1)
        acc = acc * correction[:, None] + jax.lax.dot_general(
            p.astype(vb.dtype),
            vb,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc

    _, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l[:, None]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _best_block(n: int, lo: int = 256, hi: int = 1088) -> int:
    """Block size (multiple of 16, the bf16 sublane tile) minimizing the
    round-up padding of ``n``; ties prefer larger blocks (fewer programs)."""
    best_waste, best = None, lo
    for b in range(lo, hi + 1, 16):
        waste = _round_up(n, b) - n
        if best_waste is None or waste < best_waste or (
            waste == best_waste and b > best
        ):
            best_waste, best = waste, b
    return best


def _pick_q_chunks(bq: int, ch_cap: int, chq: int = 16) -> int:
    """Number of q-row chunks for the pipelined single-K-block kernel:
    the fewest chunks whose (``chq``-aligned) chunk height fits
    ``ch_cap`` — i.e. the largest chunk that keeps the f32 score tile in
    its VMEM budget while leaving enough chains to software-pipeline.
    ``chq`` is 16 (bf16 sublane tile) normally, 32 under int8 quant
    (int8 tiles are 32 sublanes)."""
    for c in range(1, bq // chq + 1):
        if bq % c == 0 and (bq // c) % chq == 0 and bq // c <= ch_cap:
            return c
    return 1


def _best_block_chunked(
    n: int, ch_cap: int, lo: int = 256, hi: int = 1088, chq: int = 16
) -> tuple[int, int]:
    """Joint (block_q, q_chunks) choice for the chunked single-K-block
    kernel: minimize round-up waste of ``n``, then prefer the largest
    16-aligned chunk ≤ ``ch_cap`` (tiny chunks mean many small dots with
    per-op overhead), then the largest block (fewest programs). E.g.
    4112 tokens → (832, 4): 48 padded rows with 208-row chunks, where a
    waste-only choice would land on 688 with degenerate 16-row chunks.

    Chunks below 128 rows are considered only when no block offers a
    bigger one: saving a few padded rows never pays for tripling the
    per-chain op count."""
    best_key, best = None, (min(_round_up(n, chq), hi), 1)
    for ch_min in (min(_round_up(128, chq), ch_cap), chq):
        for bq in range(lo, hi + 1, chq):
            waste = _round_up(n, bq) - n
            for c in range(1, bq // chq + 1):
                ch = bq // c
                if bq % c == 0 and ch % chq == 0 and ch_min <= ch <= ch_cap:
                    key = (waste, -ch, -bq)
                    if best_key is None or key < best_key:
                        best_key, best = key, (bq, c)
                    break  # first divisor = largest chunk for this bq
        if best_key is not None:
            return best
    return best


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "dtype", "interpret")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 512,
    block_k: int = 1536,
    dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention. q/k/v: ``(B, N, H, D)`` → ``(B, N, H, D)``.

    N is padded internally to the block quantum; padded keys are masked,
    padded query outputs sliced off.

    Default blocks measured on TPU v5e with ViT-g (1029 tokens, d=64):
    bq512 + full-sequence K/V block → 35.3 slices/s vs 32.1 at bq256/bk512
    (K/V fits VMEM comfortably up to ~16k tokens; longer sequences loop).
    """
    b, n, h, d = q.shape
    scale = d**-0.5
    block_q = min(block_q, _round_up(n, 128))
    block_k = min(block_k, _round_up(n, 128))
    nq = _round_up(n, block_q)
    nk = _round_up(n, block_k)

    def prep(x, length):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, n, d).astype(dtype)
        return jnp.pad(x, ((0, 0), (0, length - n), (0, 0)))

    qf, kf, vf = prep(q, nq), prep(k, nk), prep(v, nk)

    grid = (b * h, nq // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, block_k=block_k, kv_len=n, scale=scale
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, nk, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, nk, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, nq, d), dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * 2,
            transcendentals=b * h * n * n,
        ),
    )(qf, kf, vf)

    out = out[:, :n].reshape(b, h, n, d)
    return jnp.swapaxes(out, 1, 2)


LOG2E = 1.4426950408889634


def _flash_kernel_paired(
    q_ref,
    k_ref,
    v_ref,
    bias_ref,
    o_ref,
    *,
    block_k: int,
    kv_len: int,
    scale: float,
    head_dim: int,
    exp2_bf16: bool = False,
    q_chunks: int = 1,
    softmax_shift: bool = True,
    ablate: str = "",
    channel_major: bool = False,
    quant: str = "",
):
    """Flash kernel over PAIR-PACKED planes: the block minor dim holds two
    64-wide heads side by side (lane dim 128 → full-width VMEM tiles and
    DMAs; the per-head QK^T contraction stays 64 — that part of the MXU
    inefficiency is inherent to d=64 models).

    Every pass over a (BQ, BK)-class tile — MXU or VPU — costs real time
    (Mosaic serializes large tile ops; measured r2: interleaving
    independent chains buys <2%), so the kernel minimizes PASSES:
    - ``scale`` is expected pre-folded into q (``scale`` param = 1.0 from
      the production path) — no per-score multiply,
    - the row sum is FUSED into the PV matmul by appending a ones column
      to V: ``p @ [v | 1]`` yields the output numerator and the softmax
      denominator in ONE p-tile pass through the MXU. The standalone
      ``p @ ones(BK, 8)`` it replaces cost as much MXU time as the PV
      matmul itself (a full M×K stream at 8/128 output-lane utilization)
      — it is why the r2 kernel profiled at 24% MXU,
    - key padding is handled on the SMALL operands, never the score
      tile: phantom K rows are zeroed (bias included), so their scores
      are exactly 0 (a bounded, valid softmax shift), and phantom rows
      of the ones-augmented V are zeroed, so they contribute to neither
      the numerator nor the denominator — no (BQ, BK) mask multiply,
    - with ``softmax_shift=False`` (production extractor) the row-max
      pass is skipped entirely: in the log2 domain the shift only
      guards exp2 overflow at |s·log2e| ≥ 127, i.e. natural-log logits
      ≥ 88 — far outside any trained softmax's range, and exactly where
      the reference's own f32 softmax would overflow too. Downstream
      consumers guard with an isfinite check and retry with the shifted
      kernel (``run/dino_features.py``),
    - the common single-K-block case (ViT lengths) statically skips the
      online-softmax correction state.
    """
    # q/k/v projection biases applied in-kernel on the VMEM tiles ((1, P)
    # row broadcasts) — as standalone XLA adds they each cost a full HBM
    # read+write pass of the plane (measured 24 ms/batch apiece); the q
    # bias arrives pre-multiplied by the folded softmax scale
    block_q = q_ref.shape[1]
    kv_pad = k_ref.shape[1]
    num_kb = kv_pad // block_k
    d = head_dim

    p_dtype = v_ref.dtype  # bf16 in production; f32 paths stay exact

    def softmax_num(s, m):
        """exp(s − m) (or exp2 in the log2 domain — the caller folds
        log2(e) into the q scale, so softmax ratios are unchanged), cast
        for the PV matmul. The exp is the kernel's single most expensive
        VPU op (~half its runtime at d=64); evaluating it at bf16 doubles
        VPU throughput at a cost far below bf16 attention's own quantum.
        ``m=None`` (softmax_shift=False) skips the shift — see the
        module docstring for the overflow bound that makes this safe."""
        diff = s if m is None else s - m[:, None]
        if exp2_bf16:
            return jnp.exp2(diff.astype(jnp.bfloat16)).astype(p_dtype)
        return jnp.exp(diff).astype(p_dtype)

    def scores_of(qs, kb, h):
        # Mosaic requires a 32-bit matmul accumulator/output in-kernel
        # (bf16 preferred_element_type rejected), so the score tile is f32
        s = jax.lax.dot_general(
            qs,
            kb[:, h * d : (h + 1) * d],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return s if scale == 1.0 else s * scale

    def scores(kb, h):
        return scores_of(q[:, h * d : (h + 1) * d], kb, h)

    def make_vaug(vb, h, padm):
        """Per-head ones-augmented V: ``[v_h | 1]`` (BK, D+8); phantom
        rows zeroed so padded keys vanish from numerator AND denominator.
        The 8 ones columns keep the append lane-tile friendly; column D
        of the product is the row sum."""
        v_h = vb[:, h * d : (h + 1) * d]
        ones = jnp.ones((v_h.shape[0], 8), dtype=v_h.dtype)
        vaug = jnp.concatenate([v_h, ones], axis=-1)
        return vaug if padm is None else vaug * padm.astype(vaug.dtype)

    def pv_aug(pb, vaug):
        """One MXU pass → (acc (BQ, D), rowsum (BQ,))."""
        out = jax.lax.dot_general(
            pb, vaug, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out[:, :d], out[:, d]

    if num_kb == 1:
        # Single K block: plain 2-pass softmax, no correction state,
        # software-pipelined over (q-row chunk × head) chains so the MXU
        # and VPU overlap instead of serializing (measured r2: the kernel
        # ran at 24% MXU because every softmax pass over the full score
        # tile idled the MXU). Per chain: QK^T dot (MXU) → max+exp (VPU)
        # → PV + rowsum dots (MXU); chain c+1's QK^T is issued BEFORE
        # chain c's softmax, so in steady state the VPU runs chain c's
        # softmax while the MXU retires chain c−1's PV and chain c+1's
        # scores. Chunking also bounds the f32 score tile to
        # (chunk, BK) VMEM instead of (BQ, BK).
        masked = kv_len != kv_pad
        if masked:
            # zero the phantom K rows *including their bias* (the zero-
            # padded rows would otherwise score q·k_bias — an unbounded
            # shift if it exceeds the real row max); with them exactly
            # zero the max shift stays ≥ 0 and bounded. The phantom
            # columns of the p tile need no mask: the matching rows of
            # the ones-augmented V are zeroed, removing them from both
            # the numerator and the denominator.
            row = jax.lax.broadcasted_iota(jnp.int32, (kv_pad, 1), 0)
            padm = (row < kv_len)
        else:
            padm = None
        # one program may carry several (batch·head-pair) planes
        # (``planes_per_block``) to amortize fixed per-program costs; the
        # chain pipeline flows across planes. Per-plane operands hoist the
        # 64-lane head slices out of the chain loop, so per-chain operands
        # slice only on the sublane (row) axis. (A block-diagonal
        # both-heads-in-one-dot QK variant measured flat at 512² and
        # doubles the score tile's VMEM — see the r3 notes in
        # tools/mxu_probe.py / memory: per-dot fixed cost dominates, but
        # Mosaic prices the d=64 and d=128 contractions the same, so the
        # saved dots are repaid by the 2× score width.)
        # channel_major: blocks are (1, rows, n_planes·P) lane-packed —
        # plane plx lives on lanes [plx·P, (plx+1)·P) (the natural layout
        # of the qkv projection output, see ``flash_attention_pairs``)
        if channel_major:
            pw = 2 * d
            n_planes = q_ref.shape[-1] // pw
            plane = lambda ref, plx: ref[0][:, plx * pw : (plx + 1) * pw]
        else:
            n_planes = q_ref.shape[0]
            plane = lambda ref, plx: ref[plx]
        K_H, Q_H, V_A = [], [], []
        for plx in range(n_planes):
            qp = plane(q_ref, plx) + bias_ref[plx, 0:1]
            kbp = plane(k_ref, plx) + bias_ref[plx, 1:2]
            if masked:
                kbp = kbp * padm.astype(jnp.float32)
            vbp = plane(v_ref, plx) + bias_ref[plx, 2:3]
            Q_H.append([qp[:, :d], qp[:, d:]])
            K_H.append([kbp[:, :d], kbp[:, d:]])
            V_A.append([make_vaug(vbp, h, padm) for h in (0, 1)])

        # int8 attention internals (``--int8`` 4k-token mode): operands
        # quantized IN VMEM (no extra HBM passes — the thing that made
        # int8 a wash for out-proj/w3). K/V quantize once per program
        # (hoisted out of the chain loop): K per-head per-tensor, the
        # ones-augmented V per-COLUMN so the denominator lane's scale is
        # exactly 1/127 (its int8 value is exactly 127) and dequant is a
        # per-lane multiply on the PV output tile.
        if "qk" in quant:
            K_I, SK = [], []
            for plx in range(n_planes):
                kis, sks = [], []
                for h in (0, 1):
                    kf = K_H[plx][h].astype(jnp.float32)
                    sk = jnp.max(jnp.abs(kf)) * (1.0 / 127.0)
                    kis.append(
                        jnp.round(kf * (1.0 / jnp.maximum(sk, 1e-20)))
                        .astype(jnp.int8)
                    )
                    sks.append(sk)
                K_I.append(kis)
                SK.append(sks)
        if "pv" in quant:
            V_I, SV = [], []
            for plx in range(n_planes):
                vis, svs = [], []
                for h in (0, 1):
                    vf = V_A[plx][h].astype(jnp.float32)
                    sv = jnp.max(jnp.abs(vf), axis=0) * (1.0 / 127.0)
                    vis.append(
                        jnp.round(vf * (1.0 / jnp.maximum(sv, 1e-20)))
                        .astype(jnp.int8)
                    )
                    svs.append(sv)
                V_I.append(vis)
                SV.append(svs)

        ch = block_q // q_chunks
        chains = [
            (plx, i, h)
            for plx in range(n_planes)
            for i in range(q_chunks)
            for h in (0, 1)
        ]
        S: list = [None] * len(chains)
        P: list = [None] * len(chains)
        O: list = [None] * len(chains)
        L: list = [None] * len(chains)

        def stage_scores(c):
            plx, i, h = chains[c]
            qs = Q_H[plx][h][i * ch : (i + 1) * ch]
            if ablate == "noqk":  # attribution only (wrong math): one VPU
                # broadcast stands in for the QK dot; exp + PV stay full
                S[c] = jax.lax.broadcast_in_dim(
                    qs[:, :1].astype(jnp.float32) * 1e-2,
                    (qs.shape[0], K_H[plx][h].shape[0]),
                    (0, 1),
                )
                return
            if "qk" in quant:
                qf = qs.astype(jnp.float32)
                sq = jnp.max(jnp.abs(qf)) * (1.0 / 127.0)
                qi = jnp.round(qf * (1.0 / jnp.maximum(sq, 1e-20))).astype(
                    jnp.int8
                )
                s_i = jax.lax.dot_general(
                    qi, K_I[plx][h], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                s = s_i.astype(jnp.float32) * (sq * SK[plx][h])
                S[c] = s if scale == 1.0 else s * scale
                return
            s = jax.lax.dot_general(
                qs, K_H[plx][h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            S[c] = s if scale == 1.0 else s * scale

        def stage_softmax(c):
            s, S[c] = S[c], None
            if ablate == "noexp":  # perf-lab attribution only (wrong math)
                P[c] = s.astype(p_dtype)
                return
            m = jnp.max(s, axis=-1) if softmax_shift else None
            P[c] = softmax_num(s, m)

        def stage_pv(c):
            plx, _, h = chains[c]
            p, P[c] = P[c], None
            if ablate == "nopv":  # perf-lab attribution only (wrong math)
                O[c] = p[:, :d].astype(jnp.float32)
                L[c] = jnp.ones((p.shape[0],), jnp.float32)
                return
            if ablate == "cheappv":  # attribution only (wrong math): a VPU
                # row-sum CONSUMES the full p tile (so Mosaic cannot narrow
                # the QK dot the way plain "nopv" lets it) without the PV
                # matmul — prod − cheappv ≈ the PV matmul's marginal cost
                L[c] = jnp.sum(p.astype(jnp.float32), axis=-1)
                O[c] = p[:, :d].astype(jnp.float32) + L[c][:, None]
                return
            if "pv" in quant:
                # p ∈ (0, 1] (softmax_shift forced on under quant): the
                # probability scale is the constant 1/127
                pi = jnp.round(p.astype(jnp.float32) * 127.0).astype(jnp.int8)
                out_i = jax.lax.dot_general(
                    pi, V_I[plx][h], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                out = out_i.astype(jnp.float32) * (
                    SV[plx][h][None, :] * (1.0 / 127.0)
                )
                O[c], L[c] = out[:, :d], out[:, d]
                return
            O[c], L[c] = pv_aug(p, V_A[plx][h])

        stage_scores(0)
        for c in range(len(chains)):
            if c + 1 < len(chains):
                stage_scores(c + 1)
            stage_softmax(c)
            stage_pv(c)
        for plx in range(n_planes):
            for i in range(q_chunks):
                c0 = (plx * q_chunks + i) * 2
                (o0, l0), (o1, l1) = (O[c0], L[c0]), (O[c0 + 1], L[c0 + 1])
                out = jnp.concatenate(
                    [
                        o0 * jnp.repeat((1.0 / l0)[:, None], d, axis=1),
                        o1 * jnp.repeat((1.0 / l1)[:, None], d, axis=1),
                    ],
                    axis=-1,
                )
                rows = pl.ds(i * ch, ch)
                if channel_major:
                    o_ref[0, rows, plx * 2 * d : (plx + 1) * 2 * d] = out.astype(
                        o_ref.dtype
                    )
                else:
                    o_ref[plx, rows, :] = out.astype(o_ref.dtype)
        return

    # multi-K-block online-softmax path (pb is forced to 1 here)
    q = q_ref[0] + bias_ref[0, 0:1]  # (BQ, 2·D) two heads packed on lanes
    kbias = bias_ref[0, 1:2]  # (1, P)
    vbias = bias_ref[0, 2:3]
    m0 = jnp.full((2, block_q), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((2, block_q), dtype=jnp.float32)
    acc0 = jnp.zeros((block_q, 2 * d), dtype=jnp.float32)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        # phantom K rows zeroed bias-included (bounded max shift); the
        # matching rows of the ones-augmented V are zeroed below, so no
        # (BQ, BK) mask multiply is needed in this path either
        row = jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0)
        padm = (row + i * block_k) < kv_len
        kb = (k_ref[0, pl.ds(i * block_k, block_k), :] + kbias) * padm.astype(
            jnp.float32
        )
        vb = v_ref[0, pl.ds(i * block_k, block_k), :] + vbias

        outs, ms, ls = [], [], []
        for h in (0, 1):
            vaug = make_vaug(vb, h, padm)
            s = scores(kb, h)
            # the block max must not *decrease* below the running max
            m_new = jnp.maximum(m_prev[h], jnp.max(s, axis=-1))
            pb = softmax_num(s, m_new)
            diff_m = m_prev[h] - m_new
            correction = jnp.exp2(diff_m) if exp2_bf16 else jnp.exp(diff_m)
            o_h, l_h = pv_aug(pb, vaug)
            ls.append(l_prev[h] * correction + l_h)
            outs.append(
                acc[:, h * d : (h + 1) * d] * correction[:, None] + o_h
            )
            ms.append(m_new)
        return (
            jnp.stack(ms),
            jnp.stack(ls),
            jnp.concatenate(outs, axis=-1),
        )

    _, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    inv = jnp.concatenate(
        [jnp.repeat(1.0 / l[h][:, None], d, axis=1) for h in (0, 1)], axis=-1
    )
    o_ref[0] = (acc * inv).astype(o_ref.dtype)


def _auto_blocks(n: int, chq: int = 16) -> tuple[int, int, int]:
    """The wrapper's auto (block_q, block_k, q_chunks) choice for ``n``
    tokens — exposed so callers can query it (see :func:`preferred_len`).
    ``chq`` = 32 under int8 quant (int8 sublane tile)."""
    nk_full = _round_up(n, chq)
    ch_cap = max(chq, min(320, (4_500_000 // (nk_full * 6)) // chq * chq))
    if n <= 1280:
        bq, bk = _round_up(n, chq), nk_full
        qc = _pick_q_chunks(bq, ch_cap, chq)
    elif ch_cap >= 128:
        bq, qc = _best_block_chunked(n, ch_cap, chq=chq)
        bk = nk_full
    else:
        bq, bk = _best_block(n), _best_block(n)
        qc = 1
    return bq, bk, qc


def preferred_len(n: int, quant: bool = False) -> int:
    """Token length the auto-chosen kernel grid actually processes
    (``n`` rounded up to the query-block quantum). Callers that pad
    their token axis to THIS length before the qkv projection make the
    wrapper's q-pad a no-op: the pad rows ride the projection matmul
    (fused, near-free) instead of a materialized pad of the matmul
    output at the pallas boundary (measured 24 ms/step at 4101 tokens:
    40 blocks × a (16, 4160, 1536) bf16 write)."""
    bq, _, _ = _auto_blocks(n, chq=32 if quant else 16)
    return _round_up(n, bq)


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_q", "block_k", "interpret", "pre_scaled", "exp2_bf16",
        "true_len", "q_chunks", "softmax_shift", "ablate", "planes_per_block",
        "channel_major", "plane_width", "quant",
    ),
)
def flash_attention_pairs(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
    pre_scaled: bool = False,
    exp2_bf16: bool = False,
    true_len: int | None = None,
    kv_bias: jnp.ndarray | None = None,
    q_chunks: int | None = None,
    softmax_shift: bool = True,
    ablate: str = "",
    planes_per_block: int = 1,
    channel_major: bool = False,
    plane_width: int = 128,
    quant: str = "",
) -> jnp.ndarray:
    """Flash attention on pair-packed ``(B, H/2, N, 2·D)`` planes → same
    layout. Plane ``g`` holds heads ``2g`` (lanes ``0:D``) and ``2g+1``
    (lanes ``D:2D``).

    Rationale: with d=64 the head-major layout leaves every VMEM tile,
    DMA, and projection-matmul output half-filled on the 128-lane axis.
    Packing adjacent head pairs restores full-width lanes end to end —
    the qkv projection writes 128-wide planes, the kernel streams
    128-wide K/V, and the output projection contracts over a contiguous
    (H/2)·128 = 1536 axis.

    ``channel_major=True`` takes q/k/v as ``(B, N, H·D)`` — the NATURAL
    output layout of the qkv projection matmul (plane ``g`` on lanes
    ``[g·2D, (g+1)·2D)``) — and returns the same layout. The plane axis
    becomes a grid dimension indexing lane-aligned column tiles, so the
    whole attention path runs with ZERO transposes: the (B,G,N,2D)
    layout forced XLA to materialize a (B·N, H·D)→(B,G,N,2D) transpose
    copy per qkv einsum (measured 0.91 ms × 3 per block = 110 ms/batch,
    6% of extraction) and the mirrored transpose feeding the output
    projection."""
    if channel_major:
        b, n, cdim = q.shape
        p = plane_width  # pair-plane width (two heads on shared lanes)
        g = cdim // p
    else:
        b, g, n, p = q.shape
    d = p // 2
    # contract: pre_scaled means the caller folded the softmax scale — and,
    # with exp2_bf16, also LOG2E — into q (fused into its producing matmul)
    scale = 1.0 if pre_scaled else d**-0.5 * (LOG2E if exp2_bf16 else 1.0)
    # true_len: caller already padded N to the tile quantum (so this call
    # adds NO pad/slice copies at the pallas boundary); only the first
    # true_len keys are real. Padded queries produce garbage rows the
    # caller slices/ignores.
    kv_len = true_len if true_len is not None else n
    # the token axis sits on the SUBLANE dimension of every (token, 128)
    # tile, so its quantum is 16 (bf16 tile height), not 128 — padding
    # 1029→1040 instead of 1152 trims ~10% of kernel + projection work.
    # For longer sequences pick the block size minimizing round-up waste
    # (e.g. 4101 tokens: 1040-blocks pad 1.4% where 512-blocks pad 12%).
    # int8 quant raises the quantum to 32 (int8 sublane tile).
    if quant and "pv" in quant:
        # quantized probabilities need p ∈ (0, 1]: reinstate the row-max
        # shift (its VPU passes are hidden under the MXU — r3 noexp data)
        softmax_shift = True
    chq = 32 if quant else 16
    nk_full = _round_up(n, chq)
    # VMEM cap on the per-chunk tiles (inside _auto_blocks): the pipeline
    # keeps the NEXT chunk's f32 score tile live alongside the current
    # bf16 numerator (~10B/elem), plus fixed K/V/bias buffers — so the
    # budget is deliberately conservative (the 4112-token path measured
    # 25MB scoped VMEM against the 16MB limit with a looser cap)
    ch_cap = max(chq, min(320, (4_500_000 // (nk_full * 6)) // chq * chq))
    if block_q is None or block_k is None:
        # prefer a single K block (static fast path, no online-softmax
        # correction state) whenever a ≥128-row chunk fits the budget
        bq_auto, bk_auto, qc_auto = _auto_blocks(n, chq=chq)
        if block_q is None:
            block_q = bq_auto
            if q_chunks is None:
                q_chunks = qc_auto
        if block_k is None:
            block_k = bk_auto
    block_q = min(block_q, _round_up(n, chq))
    block_k = min(block_k, _round_up(n, chq))
    if q_chunks is None:
        q_chunks = _pick_q_chunks(block_q, ch_cap, chq)
    if block_q % q_chunks or (block_q // q_chunks) % chq:
        raise ValueError(
            f"q_chunks={q_chunks} must divide block_q={block_q} into "
            f"{chq}-aligned chunks"
        )
    if quant and _round_up(n, block_k) != block_k:
        raise NotImplementedError(
            "int8 attention internals support the single-K-block path only"
        )
    nq = _round_up(n, block_q)
    nk = _round_up(n, block_k)

    def prep(x, length):
        if not channel_major:
            x = x.reshape(b * g, n, p)
        if length != n:
            x = jnp.pad(x, ((0, 0), (0, length - n), (0, 0)))
        return x

    qf, kf, vf = prep(q, nq), prep(k, nk), prep(v, nk)
    # per-plane q/k/v biases applied in-kernel ((G, 3, P): rows = q (pre-
    # scaled), k, v bias — this layout keeps the block's trailing dims
    # (3, P) equal to the array's, as Mosaic block rules require); zeros
    # when the caller pre-added them
    if kv_bias is None:
        bias = jnp.zeros((g, 3, p), dtype=q.dtype)
    else:
        bias = jnp.swapaxes(kv_bias, 0, 1).astype(q.dtype)
    # multiple planes per program amortize fixed per-program cost
    # (DMA/semaphore/window bookkeeping); only for the single-K-block path
    # and when the plane count divides cleanly
    pb = planes_per_block
    if pb > 1 and not (nk == block_k and (b * g) % pb == 0 and g % pb == 0):
        pb = 1
    kern = functools.partial(
        _flash_kernel_paired,
        block_k=block_k,
        kv_len=kv_len,
        scale=scale,
        head_dim=d,
        exp2_bf16=exp2_bf16,
        q_chunks=q_chunks,
        softmax_shift=softmax_shift,
        ablate=ablate,
        channel_major=channel_major,
        quant=quant,
    )
    if channel_major:
        # grid dims: (batch, plane group, q block) — q blocks iterate
        # fastest so each plane group's K/V block stays resident across
        # them. Plane blocks are lane-aligned COLUMN tiles of the natural
        # (B, N, G·P) projection output: a (1, rows, pb·P) block at column
        # g·P is a strided whole-tile DMA (2 KB contiguous runs), which
        # the DMA engines handle at full rate — no transposes anywhere.
        grid = (b, g // pb, nq // block_q)
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, block_q, pb * p),
                    lambda bi, gi, qi: (bi, qi, gi),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, nk, pb * p),
                    lambda bi, gi, qi: (bi, 0, gi),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, nk, pb * p),
                    lambda bi, gi, qi: (bi, 0, gi),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (pb, 3, p),
                    lambda bi, gi, qi: (gi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, pb * p),
                lambda bi, gi, qi: (bi, qi, gi),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, nq, g * p), q.dtype),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=4 * b * g * 2 * n * n * d,
                bytes_accessed=(qf.size + kf.size + vf.size + b * nq * g * p)
                * 2,
                transcendentals=b * g * 2 * n * n,
            ),
        )(qf, kf, vf, bias)
        return out[:, :n]
    grid = ((b * g) // pb, nq // block_q)
    g_blocks = g // pb
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (pb, block_q, p), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (pb, nk, p), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (pb, nk, p), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (pb, 3, p),
                lambda bh, qi: (bh % g_blocks, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (pb, block_q, p), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * g, nq, p), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * g * 2 * n * n * d,
            bytes_accessed=(qf.size + kf.size + vf.size + b * g * nq * p) * 2,
            transcendentals=b * g * 2 * n * n,
        ),
    )(qf, kf, vf, bias)
    return out[:, :n].reshape(b, g, n, p)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention_bhnd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int | None = None,
    block_k: int = 1536,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention on head-major ``(B, H, N, D)`` inputs → same layout.

    Companion to the layout-folded qkv projection in
    ``models/dinov2.py:Attention``: the projection matmul emits head-major
    planes directly and the output projection consumes them, so this path
    performs ZERO transpose ops — reshapes here are free views, only the
    token axis gets padded. (XLA TPU transposes with 64-element minor dims
    ran at ~40 GB/s and cost as much as the attention math itself; a fully
    in-kernel packed-qkv variant is blocked by Mosaic tiling/batch-dim
    constraints.)
    """
    b, h, n, d = q.shape
    scale = d**-0.5
    if block_q is None:
        # single query block when it fits VMEM (scores block_q×block_k f32
        # ≤ ~8 MB): zero query padding waste — measured 39.9 vs 37.0
        # slices/s on ViT-g (n=1029, where fixed bq512 over-pads 33%)
        block_q = _round_up(n, 128) if n <= 1280 else 512
    block_q = min(block_q, _round_up(n, 128))
    block_k = min(block_k, _round_up(n, 128))
    # q and kv pad independently to their own block quanta: one shared
    # quantum either truncates the query grid (npad // block_q drops the
    # final partial block) or over-pads queries to block_k multiples
    nq = _round_up(n, block_q)
    nk = _round_up(n, block_k)

    def prep(x, length):
        x = x.reshape(b * h, n, d)
        if length != n:
            x = jnp.pad(x, ((0, 0), (0, length - n), (0, 0)))
        return x

    qf, kf, vf = prep(q, nq), prep(k, nk), prep(v, nk)
    grid = (b * h, nq // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, kv_len=n, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, nk, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, nk, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, nq, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * d,
            bytes_accessed=(qf.size + kf.size + vf.size + b * h * nq * d) * 2,
            transcendentals=b * h * n * n,
        ),
    )(qf, kf, vf)
    return out[:, :n].reshape(b, h, n, d)
