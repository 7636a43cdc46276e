"""JPEG baseline Huffman DECODING on the TPU.

SURVEY.md §7 calls entropy decode "inherently serial per-image" — the
win there was batch parallelism on the host. This module moves the
stage onto the chip anyway, via chunked speculative decoding (after
"Accelerating JPEG Decompression on GPUs", Weissenberger & Schmidt
2021 — PAPERS.md; prototype + convergence study in
ops/jpeg_scan_chunked.py):

  1. each restart segment's bitstream is cut into C-bit chunks; every
     chunk is a SIMD lane,
  2. all lanes decode their chunk in lockstep from a guessed entry
     state (bit offset 0, fresh MCU); the decoder state at a symbol
     boundary is just (bit offset, MCU slot, coefficient index) — DC
     values are emitted as diffs, so predictors are not part of it,
  3. Jacobi iteration to the fixed point: chunk i+1's entry <- chunk
     i's exit; Huffman streams self-synchronise, so truth propagates
     many chunks per pass (measured: sync distance ~12-15 kbit -> 13
     passes at C=1024 for 1080p, image-size independent),
  4. a final pass re-decodes with converged entries and emits packed
     (block, coef, value) triples, monotone per lane, which one
     sorted scatter-add turns into dense coefficient planes; DC diffs
     are integrated by a segmented associative scan (resets at restart
     segments), and the scan-order -> component-grid permutation is a
     static gather.

Bit-pattern tolerance: speculative lanes decode garbage by
construction; every table lookup is clamped and over-long codes decode
as length 16. Non-convergence within the pass budget (or a lane
overflowing its step budget — adversarial short codes) sets a flag and
the caller falls back to the host path.

Why this is worth chip time on a host-starved system: shipping the raw
scan replaces the coefficient wire (~2.4x more bytes), the host
libjpeg entropy decode, and the sparse pack — and on this environment
an in-flight transfer steals ~2/3 of the single host core, so wire
bytes ARE host cost. The host keeps only the header parse.

Reference parity anchor: /root/reference/src/jpegcodec.cc:100-106
drives the equivalent stage through libjpeg's jpeg_read_scanlines.
"""
from __future__ import annotations

import functools
from typing import List

import numpy as np

from .jpeg_scan import (ScanInfo, ZIGZAG, derive_tables, mcu_slot_tables,
                        scatter_layout)

CHUNK_BITS = 4096            # C: per-lane chunk size. Jacobi passes to
#   fixpoint scale ~ sync_distance/C (measured 12/7/4/3 passes at
#   C=1024/2048/4096/8192 on 1080p q85 — docs/PERFORMANCE.md round 4),
#   while per-pass wall cost is ~total-bits-bound; the round-4 sweep
#   (tools/time_chunked.py) measured 16x1080p chunked decode at
#   C=2048/4096 -> 320.8/282.1 ms (C=1024 was not re-timed on chip —
#   its 12-pass fixpoint predicts ~>360 ms). 4096 is the knee: beyond
#   it the densify one-hot (nblkmax grows with C) eats the pass
#   savings. RE-CONFIRMED after the round-5 paired-step/window/table
#   rework: C=4096/6144/8192 -> 242.1/247.6/274.5 ms, parity exact.
LANE_GRANULE = 2048          # lane-count bucket (bounds recompiles)
WORD_GRANULE = 16384         # words-section floor granule (64 KiB)
STEP_GRANULE = 64            # steps bucket (bounds recompiles)
SEG_LANE_CAP = 24576         # single-pass mode: max segment bits/lane
EXIT_BLOCK_MAX = 64          # early-exit check cadence (see decoder)


from ..bucketing import bucket_geometric as _bucket_geometric  # noqa: E402
MAX_PASSES = 48              # Jacobi budget (measured need: ~13)


# ---------------------------------------------------------------------------
# host prep
# ---------------------------------------------------------------------------

def prep_tables(info: ScanInfo):
    """Per-image decode tables, one row pair per component:
    t = comp*2 + (0 dc | 1 ac). Returns (limit (6,16) i32 left-aligned
    exclusive bounds for l=1..16, delta (6,17) i32 = valptr - mincode,
    hv (6,256) i32). Unused component rows are zero.

    Memoized on the info object: the pipeline's uint8-id pre-check
    (JpegBatchPipeline.entropy_decode) and ScanBatch.__init__ both need
    these for every image of every batch, and the six derive_tables
    calls per image are pure host work on the 1-core bottleneck."""
    cached = getattr(info, "_prep_tables", None)
    if cached is not None:
        return cached
    limit = np.zeros((6, 16), np.int32)
    delta = np.zeros((6, 17), np.int32)
    hv = np.zeros((6, 256), np.int32)
    for ci in range(info.ncomp):
        for cls in (0, 1):
            lim, mc, vp, h = derive_tables(
                *info.huffman[(cls, info.scan_tables[ci][cls])])
            t = ci * 2 + cls
            limit[t] = np.minimum(lim[1:17], 2 ** 31 - 1).astype(np.int32)
            delta[t] = (vp - mc).astype(np.int32)
            hv[t] = h
    info._prep_tables = (limit, delta, hv)
    return limit, delta, hv


def min_bits_per_symbol(info: ScanInfo) -> float:
    """Tight sustained lower bound on bits/symbol under the image's
    tables — sizes the per-chunk step budget. Every symbol is a DC, an
    EOB, or a value-carrying/ZRL AC; DCs and EOBs come at most once per
    block, so the sustained minimum is the best of: an empty-block
    cycle (DC+EOB over 2 symbols), a full-block cycle (DC + 63 cheapest
    ACs over 64), or pure cheapest-AC runs."""
    min_dc, min_eob, min_ac = 16.0, 16.0, 32.0
    for (cls, _tid), (bits, vals) in info.huffman.items():
        p = 0
        for ln in range(1, 17):
            for v in vals[p : p + bits[ln - 1]]:
                if cls == 0:
                    min_dc = min(min_dc, float(ln + v))
                elif v == 0:
                    min_eob = min(min_eob, float(ln))
                else:
                    size = v & 15
                    min_ac = min(min_ac, float(ln + size))
            p += bits[ln - 1]
    return max(1.0, min((min_dc + min_eob) / 2.0,
                        (min_dc + 63.0 * min_ac) / 64.0, min_ac))


class ScanBatch:
    """Host-side wire prep for one same-signature batch of parsed
    scans. All arrays are numpy; `args()` returns the upload list."""

    def __init__(self, infos: List[ScanInfo], chunk_bits: int = CHUNK_BITS):
        self.infos = infos
        self.C = C = chunk_bits
        info0 = infos[0]
        sig = info0.comp_sig
        self.comp_sig = sig
        self.comp_of = mcu_slot_tables(sig)          # (B,)
        self.B = B = int(self.comp_of.size)
        self.mcus = mcus = info0.mcus
        self.nblk_img = mcus * B
        n_img = len(infos)

        # per-segment geometry, vectorized per image (restart-interval
        # streams have thousands of tiny segments; per-lane python
        # lists measured ~150 ms/batch)
        seg_bytes: List[bytes] = []
        seg_img, seg_blk0, seg_nblk = [], [], []
        for img, info in enumerate(infos):
            ri = info.restart_interval or mcus
            blk_base_img = img * self.nblk_img
            for si, seg in enumerate(info.segments):
                n_mcu = min(ri, mcus - si * ri)
                if n_mcu <= 0:
                    continue
                seg_bytes.append(seg)
                seg_img.append(img)
                seg_blk0.append(blk_base_img + si * ri * B)
                seg_nblk.append(n_mcu * B)
        seg_bits = np.array([len(s) * 8 for s in seg_bytes], np.int64)
        # restart-pinned SINGLE-PASS mode: when every image carries
        # restart markers and segments are chunk-sized, give each
        # segment its own (wider) lane. Every entry state is then exact
        # by construction (DRI byte-aligns and resets the MCU), so the
        # whole Jacobi speculation loop disappears — one emission pass
        # decodes everything, ~3-4x less device work than converging
        # speculative chunks (the standard corpus-prep story for
        # parallel entropy decode, PAPERS.md).
        self.single_pass = bool(
            len(seg_bytes) >= 2 * n_img
            and all(i.restart_interval for i in infos)
            and int(seg_bits.max()) <= SEG_LANE_CAP)
        if self.single_pass:
            self.C = C = int(_bucket_geometric(int(seg_bits.max()), 512))
            seg_nch = np.ones(len(seg_bytes), np.int64)
        else:
            seg_nch = np.maximum(1, -(-seg_bits // C))
        seg_img = np.array(seg_img, np.int32)
        seg_blk0 = np.array(seg_blk0, np.int32)
        seg_nblk = np.array(seg_nblk, np.int32)
        nseg = seg_nch.size
        # one padded byte buffer for all segments -> u32 words.
        # single-pass packs segments byte-tight (word-aligned): every
        # entry state is a pinned (0,0,0), so a lane only needs its
        # word base — padding each segment to the C granule was 44% of
        # the scan upload on a median-2488/C-3584 restart corpus, on a
        # link where wire bytes ARE host cost. A lane's W-word window
        # may now read into the NEXT segment's bytes; those reads are
        # inert (the lane freezes at its own bit_end, and on a valid
        # stream all blocks complete before the byte padding).
        if self.single_pass:
            seg_words = -(-seg_bits // 32)
        else:
            seg_words = seg_nch * (C // 32) + 2
        word_starts = np.concatenate(
            [[0], np.cumsum(seg_words)]).astype(np.int64)
        total_words = int(word_starts[-1])
        if total_words * 32 > 2**31 - C - 64:
            # absolute bit positions in the kernel are int32
            # (lane_word_base*32 + offsets); a ~256 MB+ padded wire
            # would wrap them negative and decode GARBAGE with ok=True.
            # Callers treat this like the table-overflow case: split
            # the batch or take the host path.
            raise ValueError(
                f"batch scan data ({total_words * 4} bytes padded) "
                f"exceeds the int32 bit-address space; split the batch "
                f"or use the host path")
        byte_buf = np.full(total_words * 4, 0xFF, np.uint8)
        for s, seg in enumerate(seg_bytes):
            o = int(word_starts[s]) * 4
            byte_buf[o : o + len(seg)] = np.frombuffer(seg, np.uint8)
        words_all = byte_buf.reshape(-1, 4).astype(np.uint32) @ np.array(
            [1 << 24, 1 << 16, 1 << 8, 1], np.uint32)
        # expand segments -> lanes (numpy repeat/cumcount)
        lane_seg = np.repeat(np.arange(nseg), seg_nch)
        lane_starts = np.concatenate(
            [[0], np.cumsum(seg_nch)]).astype(np.int64)
        chunk_in_seg = (np.arange(lane_seg.size)
                        - lane_starts[lane_seg])
        lane_word_base = (word_starts[lane_seg]
                          + chunk_in_seg * (C // 32)).astype(np.int32)
        # per-lane bit budget: C for interior chunks, the tail for a
        # segment's last chunk (stops the step loop at the real data
        # instead of grinding through 0xFF padding)
        lane_bits = np.minimum(
            C, seg_bits[lane_seg] - chunk_in_seg * C).astype(np.int32)
        lane_pinned = chunk_in_seg == 0
        lane_img = seg_img[lane_seg]
        lane_seg_first = lane_starts[lane_seg].astype(np.int32)
        lane_blk_base = seg_blk0[lane_seg]
        lane_blk_limit = seg_blk0[lane_seg] + seg_nblk[lane_seg]
        n_lanes = int(lane_seg.size)
        self.n_lanes = -(-n_lanes // LANE_GRANULE) * LANE_GRANULE
        pad = self.n_lanes - n_lanes
        trash_blk = n_img * self.nblk_img
        # dead pad lanes: pinned, pointing at the last slack words,
        # block range empty at the trash block (keeps scatter monotone)
        tail = max(64, C // 32 + 2)  # last lane + dead lanes read W words
        self.words = np.concatenate(
            [words_all, np.full(tail, 0xFFFFFFFF, np.uint32)])
        dead_base = self.words.size - C // 32 - 2

        def padded(a, fill, dtype):
            out = np.full(self.n_lanes, fill, dtype)
            out[:n_lanes] = a
            return out

        self.lane_word_base = padded(lane_word_base, dead_base, np.int32)
        self.lane_bits = padded(lane_bits, 0, np.int32)  # dead: inactive
        self.lane_pinned = padded(lane_pinned, True, bool)
        self.lane_img = padded(lane_img, n_img - 1, np.int32)
        self.lane_seg_first = padded(lane_seg_first, n_lanes, np.int32)
        self.lane_blk_base = padded(lane_blk_base, trash_blk, np.int32)
        self.lane_blk_limit = padded(lane_blk_limit, trash_blk, np.int32)

        # dedupe decode tables across the batch: a same-signature batch
        # almost always shares its Huffman tables (std tables), so the
        # per-step table select runs over a handful of UNIQUE rows held
        # in registers instead of streaming a per-lane expansion
        # through HBM (the expansion measured ~half the kernel time)
        tabs = [prep_tables(i) for i in infos]
        uniq = {}
        # build at int32 width, guard, THEN narrow: assigning id 256
        # into a uint8 array would raise numpy's OverflowError before
        # the intended ValueError below
        uid_img = np.zeros((n_img, 6), np.int32)
        rows = []
        for img, (limit, delta, hv) in enumerate(tabs):
            for t in range(6):
                key = (limit[t].tobytes(), delta[t].tobytes(),
                       hv[t].tobytes())
                if key not in uniq:
                    uniq[key] = len(rows)
                    rows.append((limit[t], delta[t], hv[t]))
                uid_img[img, t] = uniq[key]
        if len(rows) > 256:
            # lane_uid6 is uint8 on the wire (ids 0..255) — wrapping
            # would silently decode with the wrong tables. Callers
            # pre-check this (JpegBatchPipeline.entropy_decode) and
            # fall back to host.
            raise ValueError(
                f"batch has {len(rows)} unique Huffman table rows "
                f"(uint8 id space is 256); split the batch or use the "
                f"host path")
        uid_img = uid_img.astype(np.uint8)
        # granule 4, not 8: U appears in the TWO dominant per-step
        # selects (hv_pk U*64+64, limdelta U*33 — together ~2/3 of the
        # decode loop's per-lane ops), and the overwhelmingly common
        # same-tables batch (libjpeg std tables) has exactly 4 unique
        # rows. U=8 was paying ~35% extra step cost for bucket slack.
        # {4, 8, 12...} adds one extra graph variant vs the old
        # {8, 16...} — bounded, and the compile cache keys on it.
        self.n_uniq = -(-len(rows) // 4) * 4  # bucket: bounds recompiles
        self.limit = np.zeros((self.n_uniq, 16), np.int32)
        self.delta = np.zeros((self.n_uniq, 17), np.int32)
        self.hv = np.zeros((self.n_uniq, 256), np.int32)
        for u, (lim, dl, hvr) in enumerate(rows):
            self.limit[u], self.delta[u], self.hv[u] = lim, dl, hvr
        self.lane_uid6 = uid_img[self.lane_img]       # (L, 6) u8
        self.qtables = [
            np.stack([info.comps[ci][2] for info in infos])[:, None, None, :]
            for ci in range(info0.ncomp)]

        # DC segmented-scan reset geometry: each component resets at its
        # first block of every restart segment — fully determined by the
        # per-image restart span (in blocks), so only that scalar ships
        # on the wire and the decoder derives the (N, nblk) mask
        # in-graph. The materialized u8 mask this replaces was 0.78 MB
        # of every 16x1080p upload (~12% of the scan wire).
        self.ri_blk = np.array(
            [(info.restart_interval or mcus) * B for info in infos],
            np.int32)

        # worst-case symbols per chunk under these tables. steps feeds
        # the jit static key: mb depends on the batch's Huffman table
        # contents, so per-image optimized tables (PIL optimize=True)
        # would otherwise mint a fresh steps per batch and trigger a
        # full recompile (minutes through the remote compile service).
        # Round up to a coarse granule like LANE_GRANULE/WORD_GRANULE.
        mb = min(min_bits_per_symbol(i) for i in infos)
        self.steps = -(-(int(C / mb) + 8) // STEP_GRANULE) * STEP_GRANULE

        # max blocks any lane can emit into (static): single-pass lanes
        # own whole segments; speculative chunk lanes are bounded by the
        # step budget (a block consumes >= 2 symbols: DC + EOB). Feeds
        # the densification matmul's block-slot axis — the 30M-element
        # sorted scalar scatter this replaces measured 270 ms of the
        # 410 ms device decode (docs/PERFORMANCE.md round 4).
        if self.single_pass:
            span = int(seg_nblk.max())
        else:
            span = min(int(seg_nblk.max()), self.steps // 2 + 2)
        self.nblkmax = -(-span // 8) * 8

    def args(self):
        return [self.words, self.lane_word_base, self.lane_bits,
                self.lane_pinned, self.lane_seg_first,
                self.lane_blk_base, self.lane_blk_limit,
                self.limit, self.delta, self.hv, self.lane_uid6,
                self.ri_blk]

    def static_key(self):
        return (self.C, self.n_lanes, self.steps, self.B,
                tuple(int(x) for x in self.comp_of), self.mcus,
                len(self.infos), self.n_uniq, self.nblkmax,
                self.single_pass)

    def wire(self):
        """One coalesced uint8 upload buffer (this link pays a large
        fixed latency per transfer) + the static unpack key. Layout:
        words (u32, padded to WORD_GRANULE) | 4 x lane i32 tables |
        limit | delta | hv (i32) | qtables (u16 per comp) |
        lane_pinned (u8) | reset (u8)."""
        nw = _bucket_geometric(self.words.size, WORD_GRANULE)
        words = np.full(nw, 0xFFFFFFFF, np.uint32)
        words[: self.words.size] = self.words
        sections = [
            words.view(np.uint8),
            self.lane_word_base.view(np.uint8),
            self.lane_bits.view(np.uint8),
            self.lane_seg_first.view(np.uint8),
            self.lane_blk_base.view(np.uint8),
            self.lane_blk_limit.view(np.uint8),
            np.ascontiguousarray(self.limit).view(np.uint8).reshape(-1),
            np.ascontiguousarray(self.delta).view(np.uint8).reshape(-1),
            np.ascontiguousarray(self.hv).view(np.uint8).reshape(-1),
        ]
        for q in self.qtables:
            sections.append(np.ascontiguousarray(
                q.astype(np.uint16)).view(np.uint8).reshape(-1))
        sections.append(self.lane_pinned.astype(np.uint8))
        sections.append(np.ascontiguousarray(self.lane_uid6).reshape(-1))
        sections.append(self.ri_blk.view(np.uint8).reshape(-1))
        ks = self.static_key() + (nw,)
        return ks, np.concatenate(sections)


def build_wire_unpack(scan_ks, ncomp: int):
    """Device-side unpack of ScanBatch.wire() -> (decoder args tuple,
    qtabs tuple of (N, 1, 1, 64))."""
    import jax.numpy as jnp
    from jax import lax

    (C, n_lanes, steps, B, comp_of, mcus, n_img, n_uniq, _nblkmax,
     _single, nw) = scan_ks
    nblk_img = mcus * B

    def unpack(buf):
        off = 0

        def take(count, dtype):
            nonlocal off
            width = jnp.dtype(dtype).itemsize
            raw = buf[off:off + count * width]
            off += count * width
            if width == 1:
                return lax.bitcast_convert_type(raw, dtype)
            return lax.bitcast_convert_type(raw.reshape(count, width),
                                            dtype)

        words = take(nw, jnp.uint32)
        lane_word_base = take(n_lanes, jnp.int32)
        lane_bits = take(n_lanes, jnp.int32)
        lane_seg_first = take(n_lanes, jnp.int32)
        lane_blk_base = take(n_lanes, jnp.int32)
        lane_blk_limit = take(n_lanes, jnp.int32)
        limit = take(n_uniq * 16, jnp.int32).reshape(n_uniq, 16)
        delta = take(n_uniq * 17, jnp.int32).reshape(n_uniq, 17)
        hv = take(n_uniq * 256, jnp.int32).reshape(n_uniq, 256)
        qtabs = tuple(
            take(n_img * 64, jnp.uint16).reshape(n_img, 1, 1, 64)
            for _ in range(ncomp))
        lane_pinned = take(n_lanes, jnp.uint8) != 0
        lane_uid6 = take(n_lanes * 6, jnp.uint8).reshape(n_lanes, 6)
        ri_blk = take(n_img, jnp.int32)
        return (words, lane_word_base, lane_bits, lane_pinned,
                lane_seg_first, lane_blk_base, lane_blk_limit,
                limit, delta, hv, lane_uid6, ri_blk), qtabs

    return unpack


# ---------------------------------------------------------------------------
# device kernel
# ---------------------------------------------------------------------------

def build_decoder_core(C: int, n_lanes: int, steps: int, B: int,
                       comp_of: tuple, mcus: int, n_img: int,
                       n_uniq: int = 8, nblkmax: int = 0,
                       single_pass: bool = False,
                       max_passes: int = MAX_PASSES,
                       ablate: str = "", debug: bool = False):
    """Traceable fn(*ScanBatch.args()) -> (coefs (N, mcus*B, 64) i32
    natural order scan-ordered blocks with absolute DC, ok (bool)).

    debug=True additionally returns (emit_trips scalar i32,
    lane_steps (L,) i32 actual per-lane symbol counts of the emission
    pass) — profiling only, not used by any production path.

    single_pass: restart-pinned mode (ScanBatch.single_pass) — one lane
    per restart segment, every entry state exact, so the Jacobi
    convergence loop is skipped entirely and the emission pass IS the
    decode (~3-4x less device work on restart corpora).

    Splitting per component happens in the caller (split_planes /
    decode_planes) so this graph stays shape-generic. Embeddable in a
    larger jit (the batched pipeline fuses it with decode+resize)."""
    import math

    import jax
    import jax.numpy as jnp

    # early-exit blocks must tile the step budget exactly (an overshot
    # block would scatter at i >= steps, clamping onto the last row);
    # ScanBatch budgets are STEP_GRANULE multiples so this is 64 there
    EXIT_BLOCK = math.gcd(int(steps), EXIT_BLOCK_MAX) or 1

    W = C // 32 + 2
    nblk_img = mcus * B
    nblk_total = n_img * nblk_img
    comp_of_arr = np.array(comp_of, np.int32)
    zz = ZIGZAG

    U = n_uniq

    def make_step(emit: bool, local: bool = False, pair: bool = False):
        def fetch(pos, win, word_base, nwords):
            # ONE traversal of the (L, W) window buffer yields every
            # word covering the bit window at `pos` (slots wl..wl+n-1 —
            # XLA fuses the masked reductions into a single stream over
            # `win`). The old (L, W, 2) paired layout streamed twice
            # the bytes per step, and the fetch is HBM-bound: the pair
            # ablation measured it at 28% of the fixed-trip decode.
            wl = (pos >> 5) - word_base
            ar = jnp.arange(W)[None, :]
            wlc = wl[:, None]
            return [jnp.sum(jnp.where(wlc + k == ar, win, 0), axis=1)
                    for k in range(nwords)]

        def sym(w32, active, pos, slot, z, nblk, last, bit_end,
                limdelta_u, hv_flat, hv2d, hv_pk, lane_uid6, blk_base,
                blk_limit):
            P = (w32 >> jnp.uint32(16)).astype(jnp.int32)  # 16-bit peek
            tid = jnp.sum(
                jnp.where(slot[:, None] == jnp.arange(B)[None, :],
                          comp_of_arr[None, :], 0), axis=1)
            t = tid * 2 + (z > 0).astype(jnp.int32)        # (L,) 0..5
            # per-lane unique-table id: (L, 6) u8 one-hot over t (tiny)
            uid = jnp.sum(
                jnp.where(t[:, None] == jnp.arange(6)[None, :],
                          lane_uid6.astype(jnp.int32), 0), axis=1)
            if "tables" in ablate:  # timing ablation: fake clen/idx
                clen = 2 + (P & 7)
                idx = P & 255
            else:
                # per-unique-row masked accumulation, unrolled over the
                # TINY static U: every intermediate is (L, 16/17) and
                # single-use, so XLA fuses compare->mask->reduce into
                # one register-resident pass. The previous combined
                # (L, U, 33) where-product fed TWO consumers (clen and
                # d_sel) and was materialized to HBM every step —
                # measured 28% of the fixed-trip decode, as much as the
                # bit-window fetch itself.
                Pm = P[:, None]
                k16 = jnp.arange(17)[None, :]
                cnt = jnp.zeros_like(P)
                for u in range(U):
                    mu = uid == u
                    c_u = jnp.sum(
                        (Pm >= limdelta_u[u, :16][None, :]).astype(
                            jnp.int32), axis=1)
                    cnt = cnt + jnp.where(mu, c_u, 0)
                clen = jnp.minimum(1 + cnt, 16)
                cl_oh = clen[:, None] == k16
                d_sel = jnp.zeros_like(P)
                for u in range(U):
                    mu = uid == u
                    d_u = jnp.sum(
                        jnp.where(cl_oh, limdelta_u[u, 16:][None, :], 0),
                        axis=1)
                    d_sel = d_sel + jnp.where(mu, d_u, 0)
                idx = jnp.clip((P >> (16 - clen)) + d_sel, 0, 255)
            if "gather" in ablate:  # timing ablation: fake the symbol
                sym_v = idx & 127
            elif "onehot" in ablate:
                # gather-free symbol lookup: fused broadcast-compare
                # reduction over the tiny (U, 256) table
                sel = ((uid[:, None] == jnp.arange(U)[None, :])[:, :, None]
                       & (idx[:, None, None]
                          == jnp.arange(256)[None, None, :]))
                sym_v = jnp.sum(jnp.where(sel, hv2d[None, :, :], 0),
                                axis=(1, 2))
            elif "hvgather" in ablate:
                sym_v = hv_flat[uid * 256 + idx]
            else:
                # select-PACKED symbol lookup: 4 symbols per int32 word
                # -> U-row select + 64-wide word one-hot + byte extract.
                # Measured 3.52 ns/lane vs 10.52 for the 2048-entry
                # scalar gather this replaces (tools/micro_scaling.py);
                # the gather was 35% of the decode loop.
                u_oh2 = (uid[:, None] == jnp.arange(U)[None, :])
                hr = jnp.sum(jnp.where(u_oh2[:, :, None],
                                       hv_pk[None, :, :], 0),
                             axis=1)                       # (L, 64)
                oh64 = ((idx >> 2)[:, None]
                        == jnp.arange(64)[None, :])
                wsel = jnp.sum(jnp.where(oh64, hr, 0), axis=1)
                sym_v = (wsel >> ((idx & 3) * 8)) & 0xFF
            run = jnp.where(z > 0, sym_v >> 4, 0)
            size = sym_v & 15
            # value bits: bits [clen, clen+size) of the same window
            sizem1 = jnp.maximum(size - 1, 0).astype(jnp.uint32)
            val = jnp.where(
                size > 0,
                ((w32 << clen.astype(jnp.uint32)) >> (jnp.uint32(32)
                 - jnp.maximum(size, 1).astype(jnp.uint32))
                 ).astype(jnp.int32), 0)
            val = jnp.where(val < (1 << sizem1).astype(jnp.int32),
                            val - (1 << size) + 1, val)
            val = jnp.where(size > 0, val, 0)
            is_dc = z == 0
            is_eob = (~is_dc) & (size == 0) & (run != 15)
            is_zrl = (~is_dc) & (size == 0) & (run == 15)
            z_coef = jnp.where(is_dc, 0, z + run)          # emit position
            z_new = jnp.where(
                is_dc, 1,
                jnp.where(is_eob, 64,
                          jnp.where(is_zrl, z + 16, z + run + 1)))
            adv = clen + jnp.where(is_dc | (~is_eob) & (~is_zrl), size, 0)
            pos_new = jnp.where(active, pos + adv, pos)
            ended = active & (z_new >= 64)
            z_new = jnp.where(active, jnp.where(z_new >= 64, 0, z_new), z)
            slot_new = jnp.where(ended, (slot + 1) % B, slot)
            nblk_new = jnp.where(ended, nblk + 1, nblk)
            if not emit:
                return pos_new, slot_new, z_new, nblk_new, last, None
            # scatter in ZIGZAG coefficient space: z_coef is
            # non-decreasing within a block and blocks are partitioned
            # across lanes in order, so real emissions are monotone per
            # lane; masked slots RE-USE the lane's last emitted index
            # with a zero add (a fresh index computed from frozen state
            # could overtake the next lane's early writes and break the
            # sorted-scatter contract). Dezigzag is a dense permutation
            # afterwards.
            blk = blk_base + nblk
            emit_ok = ((active & (size > 0)) | (active & is_dc)) \
                & (z_coef < 64) & (blk < blk_limit)
            if local:
                # lane-LOCAL emission (block slot nblk, zigzag coef):
                # consumed by the matmul densification, which needs no
                # sortedness — masked slots just carry a zero value at
                # slot 0, and no `last` bookkeeping is required.
                eidx = jnp.where(emit_ok,
                                 nblk * 64 + jnp.clip(z_coef, 0, 63), 0)
                eval_ = jnp.where(emit_ok, val, 0)
                return (pos_new, slot_new, z_new, nblk_new, last,
                        (eidx, eval_))
            blkc = jnp.minimum(blk, blk_limit)
            eidx_raw = blkc * 64 + jnp.clip(z_coef, 0, 63)
            eidx = jnp.where(emit_ok, eidx_raw, last)
            eval_ = jnp.where(emit_ok, val, 0)
            last_new = jnp.where(emit_ok, eidx_raw, last)
            return (pos_new, slot_new, z_new, nblk_new, last_new,
                    (eidx, eval_))

        def unpack_state(state):
            if emit and not local:
                pos, slot, z, nblk, over, last = state
            else:
                (pos, slot, z, nblk, over), last = state, None
            return pos, slot, z, nblk, over, last

        def pack_state(pos, slot, z, nblk, over, last):
            if emit and not local:
                return (pos, slot, z, nblk, over, last)
            return (pos, slot, z, nblk, over)

        def w32_at(pos, w_lo, w_hi):
            b = (pos & 31).astype(jnp.uint32)
            return (w_lo << b) | jnp.where(
                b == 0, jnp.uint32(0), w_hi >> (jnp.uint32(32) - b))

        def step(state, win, word_base, bit_end, limdelta_u, hv_flat,
                 hv2d, hv_pk, lane_uid6, blk_base, blk_limit):
            pos, slot, z, nblk, over, last = unpack_state(state)
            active = pos < bit_end
            if "window" in ablate:  # timing ablation: fake the window
                w32 = (pos.astype(jnp.uint32) * jnp.uint32(2654435761))
            else:
                w0, w1 = fetch(pos, win, word_base, 2)
                w32 = w32_at(pos, w0, w1)
            pos, slot, z, nblk, last, em = sym(
                w32, active, pos, slot, z, nblk, last, bit_end,
                limdelta_u, hv_flat, hv2d, hv_pk, lane_uid6, blk_base,
                blk_limit)
            return pack_state(pos, slot, z, nblk, over, last), em

        def step2(state, win, word_base, bit_end, limdelta_u, hv_flat,
                  hv2d, hv_pk, lane_uid6, blk_base, blk_limit):
            # TWO symbols per fetch: one traversal of `win` yields the
            # three words covering both bit windows (a symbol consumes
            # <= 27 bits, so bit offsets stay inside w0..w2), and the
            # second symbol recomputes tables from the UPDATED state —
            # every transition pairs (DC->AC, AC->AC, EOB->DC across
            # blocks), unlike the reverted r3 LUT pairing which could
            # only pair same-table ACs. Halves the loop trips AND the
            # window traffic per symbol; the table/value work per
            # symbol is unchanged.
            pos, slot, z, nblk, over, last = unpack_state(state)
            active = pos < bit_end
            w0, w1, w2 = fetch(pos, win, word_base, 3)
            pos1, slot1, z1, nblk1, last1, em1 = sym(
                w32_at(pos, w0, w1), active, pos, slot, z, nblk, last,
                bit_end, limdelta_u, hv_flat, hv2d, hv_pk, lane_uid6,
                blk_base, blk_limit)
            # symbol 2's two words: pos1 advanced 0..27 bits, so its
            # window starts in w0 or w1 (frozen lanes re-decode the
            # same window; their updates are masked by active2=False)
            crossed = (pos1 >> 5) > (pos >> 5)
            w_lo = jnp.where(crossed, w1, w0)
            w_hi = jnp.where(crossed, w2, w1)
            active2 = pos1 < bit_end
            pos2, slot2, z2, nblk2, last2, em2 = sym(
                w32_at(pos1, w_lo, w_hi), active2, pos1, slot1, z1,
                nblk1, last1, bit_end, limdelta_u, hv_flat, hv2d, hv_pk,
                lane_uid6, blk_base, blk_limit)
            return (pack_state(pos2, slot2, z2, nblk2, over, last2),
                    (em1, em2))

        return step2 if pair else step

    # lane emissions stay lane-LOCAL and densify via the one-hot matmul
    # below (the global sorted scatter this replaces measured 270 ms of
    # the 410 ms device decode). Single-pass lanes own whole disjoint
    # segments (each block has exactly one writer); speculative chunk
    # lanes share boundary blocks — a block of <= 1665 bits spans at
    # most 1665//C + 2 chunks, so global placement sums that many
    # owner-adjacent lanes (straddlers write disjoint coefficient
    # cells, so the sum is exact).
    local_emit = bool(nblkmax > 0)
    M_STRADDLE = 1 if single_pass else (1665 // max(C, 1) + 2)
    # paired stepping (2 symbols per loop trip, one shared window
    # fetch): ablations and debug keep the single-symbol loop for
    # comparability / per-step accounting
    use_pair = not ablate and not debug and EXIT_BLOCK % 2 == 0
    step_fn = make_step(False, pair=use_pair)
    emit_fn = make_step(True, local_emit, pair=use_pair)

    def run_chunk(entries, win_pair, word_base, bit_end, limdelta_u,
                  hv_flat, hv2d, hv_pk, lane_uid6, blk_base, blk_limit):
        off, slot, z = entries
        pos0 = word_base * 32 + off
        state = (pos0, slot, z, jnp.zeros_like(off),
                 jnp.zeros_like(off, dtype=bool))

        # while_loop to the LAST active lane, bounded by `steps`: real
        # content averages ~6 bits/symbol, so most passes finish in a
        # third of the worst-case budget. The early-exit check runs
        # once per EXIT_BLOCK-step inner block, not per step — the
        # per-step cross-lane any() measured ~330 us/step on the real
        # chip, as much as the whole step body (ablation table in
        # docs/PERFORMANCE.md); `steps` is a STEP_GRANULE multiple so
        # 64-aligned blocks never overshoot the budget.
        def cond(c):
            i, st = c
            if "fixed" in ablate:  # fixed trips: comparable ablations
                return i < steps
            return (i < steps) & jnp.any(st[0] < bit_end)

        def body(c):
            i, st = c

            def inner(_k, st):
                st, _o = step_fn(st, win_pair, word_base, bit_end,
                                 limdelta_u, hv_flat, hv2d, hv_pk,
                                 lane_uid6, blk_base, blk_limit)
                return st

            if "fixed" in ablate:  # per-step loop for comparability
                return (i + 1, inner(0, st))
            trips = EXIT_BLOCK // 2 if use_pair else EXIT_BLOCK
            return (i + EXIT_BLOCK,
                    jax.lax.fori_loop(0, trips, inner, st))

        _, st = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
        pos, slot, z, nblk, _ = st
        overflow = pos < bit_end              # didn't finish in budget
        return (pos - (word_base * 32 + C), slot, z), nblk, overflow

    def run_chunk_emit(entries, win_pair, word_base, bit_end, limdelta_u,
                       hv_flat, hv2d, hv_pk, lane_uid6, blk_base,
                       blk_limit):
        """Emitting run_chunk (lane-LOCAL emission layout only): same
        loop, but every step also lands (eidx, eval) rows in
        (steps, width) buffers. Powers the emission-merged chunked
        path: full convergence passes store their emissions, so the
        separate full-width emission pass disappears — one whole
        bits-bound pass of the chunked decode (docs/PERFORMANCE.md
        round 4). Returns (exit_entries, nblk, overflow, buf_i, buf_v).
        The block-bound mask uses the LANE-LOCAL loose bound (segment
        start + segment length): exact converged block starts are not
        known during convergence, and for a correct-entry lane on a
        valid stream the two masks admit identical emissions; garbage
        lanes get re-emitted after convergence anyway."""
        off, slot, z = entries
        width = off.shape[0]
        pos0 = word_base * 32 + off
        st0 = (pos0, slot, z, jnp.zeros_like(off),
               jnp.zeros_like(off, dtype=bool))
        buf_i0 = jnp.zeros((steps, width), jnp.int32)
        buf_v0 = jnp.zeros((steps, width), jnp.int32)

        def cond(c):
            i, st, _bi, _bv = c
            return (i < steps) & jnp.any(st[0] < bit_end)

        def body(c):
            i, st, buf_i, buf_v = c

            def inner(k, c2):
                st, bi, bv = c2
                st, em = emit_fn(st, win_pair, word_base,
                                 bit_end, limdelta_u, hv_flat,
                                 hv2d, hv_pk, lane_uid6,
                                 blk_base, blk_limit)
                if use_pair:
                    (e1, v1), (e2, v2) = em
                    return (st,
                            bi.at[i + 2 * k].set(e1)
                              .at[i + 2 * k + 1].set(e2),
                            bv.at[i + 2 * k].set(v1)
                              .at[i + 2 * k + 1].set(v2))
                eidx, ev = em
                return st, bi.at[i + k].set(eidx), bv.at[i + k].set(ev)

            trips = EXIT_BLOCK // 2 if use_pair else EXIT_BLOCK
            st, buf_i, buf_v = jax.lax.fori_loop(
                0, trips, inner, (st, buf_i, buf_v))
            return (i + EXIT_BLOCK, st, buf_i, buf_v)

        _, st, buf_i, buf_v = jax.lax.while_loop(
            cond, body, (jnp.int32(0), st0, buf_i0, buf_v0))
        pos, slot, z, nblk, _ = st
        overflow = pos < bit_end
        return ((pos - (word_base * 32 + C), slot, z), nblk, overflow,
                buf_i, buf_v)

    def fn(words, lane_word_base, lane_bits, lane_pinned, lane_seg_first,
           lane_blk_base, lane_blk_limit, limit, delta, hv, lane_uid6,
           ri_blk):
        L = n_lanes
        # (L, W) u32: the step's fused dual select reads slots wl and
        # wl+1 from this single buffer in one traversal
        win_pair = words[(lane_word_base[:, None]
                          + jnp.arange(W)[None, :]).astype(jnp.int32)]
        limdelta_u = jnp.concatenate([limit, delta], axis=1)  # (U, 33)
        hv_flat = hv.reshape(-1)           # (U*256,)
        # 4 symbols packed per int32 word for the select-packed lookup
        hv_pk = jnp.sum(hv.reshape(U, 64, 4)
                        << (jnp.arange(4, dtype=jnp.int32) * 8), axis=2)
        zero = jnp.zeros(L, jnp.int32)
        bit_end = lane_word_base * 32 + lane_bits

        def propagate(ex):
            # chunk i+1's entry <- chunk i's exit (segment-start lanes
            # keep the pinned (0,0,0) entry)
            return tuple(
                jnp.where(lane_pinned, 0,
                          jnp.concatenate([jnp.zeros(1, jnp.int32),
                                           e[:-1]]))
                for e in ex)

        # Jacobi with FRONTIER COMPACTION: after the first couple of
        # passes only the unsynced frontier of lanes has a new entry
        # state (self-synchronisation resolves the rest in place), so
        # re-decoding every lane every pass wastes ~3/4 of the work.
        # Each pass decodes only lanes whose entry differs from the one
        # their stored exit was computed from; when that frontier fits
        # in a CAP-lane compact buffer, the decode runs gathered at
        # CAP width (dead-lane fill), exits scattered back.
        CAP = max(LANE_GRANULE // 2, L // 4)

        def decode_full(entries, ex, nblk, ov):
            ex2, nblk2, ov2 = run_chunk(
                entries, win_pair, lane_word_base, bit_end, limdelta_u,
                hv_flat, hv, hv_pk, lane_uid6, lane_blk_base,
                lane_blk_limit)
            return ex2, nblk2, ov2

        def decode_full_emit(entries):
            return run_chunk_emit(
                entries, win_pair, lane_word_base, bit_end, limdelta_u,
                hv_flat, hv, hv_pk, lane_uid6, lane_blk_base,
                lane_blk_limit)

        # second compaction tier: after the first couple of passes the
        # unsynced frontier is typically tens-to-hundreds of lanes —
        # far below CAP — and a CAP-wide gathered decode wastes ~3/4
        # of each late pass. CAP2 catches the shrunken frontier.
        CAP2 = max(LANE_GRANULE // 8, L // 16)

        def decode_compact(need, entries, ex, nblk, ov, cap=None):
            cap = CAP if cap is None else cap
            ids = jnp.nonzero(need, size=cap, fill_value=L - 1)[0]
            ex_c, nblk_c, ov_c = run_chunk(
                tuple(e[ids] for e in entries), win_pair[ids],
                lane_word_base[ids], bit_end[ids], limdelta_u, hv_flat,
                hv, hv_pk, lane_uid6[ids], lane_blk_base[ids],
                lane_blk_limit[ids])
            ex2 = tuple(e.at[ids].set(c) for e, c in zip(ex, ex_c))
            return ex2, nblk.at[ids].set(nblk_c), ov.at[ids].set(ov_c)

        def pass_body(carry):
            entries, decoded, ex, nblk, ov, it, _ = carry
            need = jnp.zeros(L, bool)
            for e, d in zip(entries, decoded):
                need = need | (e != d)
            count = jnp.sum(need.astype(jnp.int32))
            ex, nblk, ov = jax.lax.cond(
                count > CAP,
                lambda a: decode_full(entries, *a),
                lambda a: jax.lax.cond(
                    count > CAP2,
                    lambda b: decode_compact(need, entries, *b),
                    lambda b: decode_compact(need, entries, *b,
                                             cap=CAP2),
                    a),
                (ex, nblk, ov))
            prop = propagate(ex)
            changed = jnp.any(jnp.stack(
                [jnp.any(p != e) for p, e in zip(prop, entries)]))
            return (prop, entries, ex, nblk, ov, it + 1, changed)

        def pass_cond(carry):
            _, _, _, _, _, it, changed = carry
            if "fixed" in ablate:  # fixed pass count for comparability
                return it < 8
            return changed & (it < max_passes)

        # emission-merged chunked mode: full convergence passes store
        # their lane-local emissions (a lane's emission is a pure
        # function of its entry state, so buffers from the last full
        # pass stay valid for every lane whose entry didn't change
        # after it); at the fixpoint only that changed set needs one
        # compact re-emission — the separate full-width emission pass
        # (one whole bits-bound decode of the batch) disappears.
        # debug mode keeps the legacy loop (it reports emission-pass
        # step counts, which the merged path spreads across passes).
        merged = local_emit and not single_pass and not debug
        emit_entries = None

        def pass_body_emit(carry):
            entries, decoded, ex, nblk, ov, it, _, bufs, emtent = carry
            need = jnp.zeros(L, bool)
            for e, d in zip(entries, decoded):
                need = need | (e != d)
            count = jnp.sum(need.astype(jnp.int32))

            def full(a):
                # pass 1's buffers are always overwritten by pass 2
                # (entries jump from the (0,0,0) guess to real exits),
                # so skip its emission-buffer traffic; if the loop DOES
                # end after one pass, emtent stays sentinel and the
                # final re-emission falls back to a full pass.
                ex, nblk, ov, bufs, emtent = a

                def plain(b):
                    ex2, nblk2, ov2 = decode_full(entries, *b[:3])
                    return ex2, nblk2, ov2, b[3], b[4]

                def emitting(b):
                    ex2, nblk2, ov2, bi, bv = decode_full_emit(entries)
                    return ex2, nblk2, ov2, (bi, bv), entries

                return jax.lax.cond(it > 0, emitting, plain, a)

            def compact(a):
                ex, nblk, ov, bufs, emtent = a
                ex2, nblk2, ov2 = jax.lax.cond(
                    count > CAP2,
                    lambda b: decode_compact(need, entries, *b),
                    lambda b: decode_compact(need, entries, *b,
                                             cap=CAP2),
                    (ex, nblk, ov))
                return ex2, nblk2, ov2, bufs, emtent

            ex, nblk, ov, bufs, emtent = jax.lax.cond(
                count > CAP, full, compact,
                (ex, nblk, ov, bufs, emtent))
            prop = propagate(ex)
            changed = jnp.any(jnp.stack(
                [jnp.any(p != e) for p, e in zip(prop, entries)]))
            return (prop, entries, ex, nblk, ov, it + 1, changed,
                    bufs, emtent)

        def pass_cond_emit(carry):
            it, changed = carry[5], carry[6]
            if "fixed" in ablate:  # fixed pass count for comparability
                return it < 8
            return changed & (it < max_passes)

        if single_pass:
            # restart-pinned: every lane IS a segment start, entries are
            # exact (0, 0, 0) and block starts are the wire's segment
            # geometry — no convergence loop, the emission pass decodes
            entries = (zero, zero, zero)
            blk_start = lane_blk_base
            ok = jnp.bool_(True)   # refined from the emission exit below
        else:
            sentinel = (jnp.full(L, -1, jnp.int32),) * 3  # force pass 1
            if merged:
                bufs0 = (jnp.zeros((steps, L), jnp.int32),
                         jnp.zeros((steps, L), jnp.int32))
                init = ((zero, zero, zero), sentinel,
                        (zero, zero, zero), zero, jnp.zeros(L, bool),
                        jnp.int32(0), jnp.bool_(True), bufs0, sentinel)
                (entries, _, ex_fin, nblk, overflow, it, changed,
                 bufs, emit_entries) = jax.lax.while_loop(
                    pass_cond_emit, pass_body_emit, init)
            else:
                init = ((zero, zero, zero), sentinel,
                        (zero, zero, zero), zero, jnp.zeros(L, bool),
                        jnp.int32(0), jnp.bool_(True))
                entries, _, ex_fin, nblk, overflow, it, changed = \
                    jax.lax.while_loop(pass_cond, pass_body, init)
            ok = (~changed) & ~jnp.any(overflow)

            # converged per-lane block starts: segmented prefix of nblk
            csum = jnp.cumsum(nblk)
            prev = jnp.concatenate([jnp.zeros(1, jnp.int32), csum[:-1]])
            seg_base = prev[lane_seg_first]  # cumsum before segment start
            blk_start = lane_blk_base + (prev - seg_base)

        # final emission pass (early-exit like the convergence passes,
        # block-checked the same way; rows past the last active step —
        # including the dead rows inside a partially-live final block,
        # where emit_ok is False — carry each lane's final emitted
        # index + zero value, keeping the flat stream sorted)
        def emit_cond(c):
            i, st, _bi, _bv, _ls = c
            if "fixed" in ablate:
                return i < steps
            return (i < steps) & jnp.any(st[0] < bit_end)

        def emit_step(i, st, buf_i, buf_v, lane_steps):
            if debug:
                lane_steps = lane_steps + (st[0] < bit_end).astype(
                    jnp.int32)
            st, em = emit_fn(st, win_pair, lane_word_base,
                             bit_end, limdelta_u, hv_flat, hv,
                             hv_pk, lane_uid6, blk_start,
                             lane_blk_limit)
            if use_pair:
                (e1, v1), (e2, v2) = em
                return (st, buf_i.at[i].set(e1).at[i + 1].set(e2),
                        buf_v.at[i].set(v1).at[i + 1].set(v2),
                        lane_steps)
            eidx, ev = em
            return st, buf_i.at[i].set(eidx), buf_v.at[i].set(ev), \
                lane_steps

        def emit_body(c):
            i, st, buf_i, buf_v, lane_steps = c
            if "fixed" in ablate:
                st, buf_i, buf_v, lane_steps = emit_step(
                    i, st, buf_i, buf_v, lane_steps)
                return (i + 1, st, buf_i, buf_v, lane_steps)
            span = 2 if use_pair else 1

            def inner(k, c2):
                st, buf_i, buf_v, lane_steps = c2
                return emit_step(i + k * span, st, buf_i, buf_v,
                                 lane_steps)

            st, buf_i, buf_v, lane_steps = jax.lax.fori_loop(
                0, EXIT_BLOCK // span, inner,
                (st, buf_i, buf_v, lane_steps))
            return (i + EXIT_BLOCK, st, buf_i, buf_v, lane_steps)

        off, slot, z = entries
        pos0 = lane_word_base * 32 + off
        if merged:
            # the stored full-pass buffers cover every lane whose entry
            # is final; re-emit only the set whose entry changed after
            # the last full pass — compact when it fits CAP, else one
            # full emitting pass ("fullemit" in ablate forces the full
            # branch, which CPU-sized tests can't reach otherwise).
            # The compact re-emission lands back at full width through
            # a one-hot MXU matmul (emission values are < nblkmax*64 <
            # 2^24, exact in f32) + an elementwise where — the same
            # scatter-free pattern as the densification itself, so the
            # merge adds no gathers/scatters anywhere downstream.
            buf_i, buf_v = bufs
            need = jnp.zeros(L, bool)
            for e, d in zip(entries, emit_entries):
                need = need | (e != d)
            count = jnp.sum(need.astype(jnp.int32))

            def emit_full(_):
                _ex, _nb, _ov, bi, bv = decode_full_emit(entries)
                return bi, bv

            def emit_compact(_):
                ids = jnp.nonzero(need, size=CAP, fill_value=L - 1)[0]
                _ex, _nb, _ov, cbi, cbv = run_chunk_emit(
                    tuple(e[ids] for e in entries), win_pair[ids],
                    lane_word_base[ids], bit_end[ids], limdelta_u,
                    hv_flat, hv, hv_pk, lane_uid6[ids],
                    lane_blk_base[ids], lane_blk_limit[ids])
                # expand (steps, CAP) -> (steps, L): one-hot over the
                # SORTED ids, first occurrence only (fill duplicates of
                # lane L-1 would otherwise sum k copies of its rows)
                first = jnp.concatenate(
                    [jnp.ones(1, bool), ids[1:] != ids[:-1]])
                oh = ((ids[:, None] == jnp.arange(L)[None, :])
                      & first[:, None]).astype(jnp.float32)
                # eidx reaches nblkmax*64 (~17 bits); the TPU's default
                # f32 dot keeps only ~16 mantissa bits (measured
                # maxdiff 256 at this scale), so the INDEX expand needs
                # HIGHEST precision. Values are < 2^11 — default is
                # exact for them.
                nbi = jnp.dot(cbi.astype(jnp.float32), oh,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
                # values are < 2^11: HIGH (bf16_3x, hi+lo covers 16
                # mantissa bits against a 0/1 one-hot) is exact for
                # them. Pinned explicitly — a backend whose DEFAULT dot
                # is single-pass bf16 (~8 mantissa bits) would silently
                # corrupt coefficients > 255 (advisor r4).
                nbv = jnp.dot(cbv.astype(jnp.float32), oh,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGH)
                nm = need[None, :]
                return (jnp.where(nm, nbi.astype(jnp.int32), buf_i),
                        jnp.where(nm, nbv.astype(jnp.int32), buf_v))

            force_full = "fullemit" in ablate
            buf_i, buf_v = jax.lax.cond(
                jnp.bool_(force_full) | (count > CAP),
                emit_full, emit_compact, 0)
            i_end, lane_steps = jnp.int32(0), zero  # debug-only outputs
        else:
            if local_emit:
                st0 = (pos0, slot, z, zero, jnp.zeros(L, bool))
            else:
                last0 = blk_start * 64 + jnp.clip(z, 0, 63)
                st0 = (pos0, slot, z, zero, jnp.zeros(L, bool), last0)
            buf_i = jnp.zeros((steps, L), jnp.int32)
            buf_v = jnp.zeros((steps, L), jnp.int32)
            if "noemit" in ablate:  # fake: skip the decode loop entirely
                i_end, st_end, lane_steps = jnp.int32(0), st0, zero
            else:
                i_end, st_end, buf_i, buf_v, lane_steps = \
                    jax.lax.while_loop(
                        emit_cond, emit_body,
                        (jnp.int32(0), st0, buf_i, buf_v, zero))
        if single_pass:
            # the emission pass is the only decode: a lane that ran out
            # of step budget before consuming its segment means a
            # malformed stream -> host fallback
            ok = ok & ~jnp.any(st_end[0] < bit_end)
        if local_emit:
            # --- matmul densification (single-pass) -----------------------
            # Factor each lane-local emission index into (block slot,
            # zigzag coef) and build the dense (lane, nblkmax, 64)
            # planes as ONE-HOT batched matmuls on the MXU — ~20 ms at
            # the bench shape where the sorted scalar scatter-add took
            # 270 ms (tools/exp_scatter.py). Coefficients are < 2^12 and
            # each (slot, coef) cell receives at most one real emission,
            # so f32 accumulation is exact. The coef one-hot compares
            # against the zigzag positions of natural-order columns,
            # folding the dezigzag permutation in for free.
            if "noscatter" in ablate:  # fake: reshape instead of densify
                need = nblk_total * 64
                flat_v = buf_v.T.reshape(-1)
                pad = max(0, need - flat_v.size)
                out = jnp.concatenate(
                    [flat_v, jnp.zeros(pad, jnp.int32)])[:need]
                out = out.reshape(n_img, nblk_img, 64)
            else:
                dezig = jnp.asarray(np.argsort(zz))  # natural col -> zz pos
                # map-chunk width: the one-hot operand hv is
                # (CH, S, nblkmax) f32 TRANSIENT — bound it to ~1.5 GB
                # so large-C configs (steps and nblkmax grow with
                # CHUNK_BITS) don't OOM HBM. CH must divide the width;
                # widths are power-of-two multiples (LANE_GRANULE lanes
                # or the power-of-two-halved CAP), so halving from 2048
                # always lands on a divisor.
                ch_cap = max(1, (384 << 20) // max(steps * nblkmax, 1))

                def densify_chunk(args):
                    # NOTE (measured): an int8 variant (v split 4+8
                    # bits, two s8xs8->s32 einsums) probed 19x faster
                    # standalone but lowered to a 10x SLOWER in-graph
                    # kernel (2798 ms vs 272 ms whole-decode) — XLA's
                    # int8 dot path inside lax.map picks a catastrophic
                    # layout. Keep f32 (exact: one emission per cell,
                    # |v| < 2^11 within the default dot's ~16 mantissa
                    # bits).
                    i_c, v_c = args                   # (CH, S)
                    hi = (i_c >> 6)[:, :, None]
                    lo = (i_c & 63)[:, :, None]
                    hv = (v_c.astype(jnp.float32)[:, :, None]
                          * (hi == jnp.arange(nblkmax)[None, None, :]))
                    ln = (lo == dezig[None, None, :]).astype(jnp.float32)
                    # |v| < 2^11 against a 0/1 one-hot: HIGH (bf16_3x)
                    # is exact — pinned so a single-pass-bf16 DEFAULT
                    # backend can't corrupt values > 255 (advisor r4)
                    return jnp.einsum(
                        "lsb,lsc->lbc", hv, ln,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGH)

                def densify(bi, bv):   # (S, width) -> (width, nblkmax, 64)
                    width = bi.shape[1]
                    ch = 2048
                    while ch > 1 and (ch > ch_cap or width % ch):
                        ch //= 2
                    nck = width // ch
                    d3 = jax.lax.map(
                        densify_chunk,
                        (bi.T.reshape(nck, ch, steps),
                         bv.T.reshape(nck, ch, steps)))
                    return d3.reshape(width, nblkmax, 64).astype(
                        jnp.int32)

                loc3 = densify(buf_i, buf_v)
                # global placement: block g's OWNER is the last lane
                # whose block range starts at or before g (scatter lane
                # block starts + cummax; pad lanes point past the range
                # and are dropped). The owner always covers g with local
                # slot g - start < nblkmax (lane starts are a segmented
                # cumsum of per-lane block counts). In chunked mode the
                # M_STRADDLE-1 preceding lanes may also have written
                # into g's boundary cells — their unwritten cells are
                # zero, so a masked sum is exact.
                lane_ids = jnp.arange(L, dtype=jnp.int32)
                bs = blk_start
                own = jnp.zeros(nblk_total, jnp.int32).at[
                    bs].max(lane_ids, mode="drop")
                own = jax.lax.associative_scan(jnp.maximum, own)
                base = jnp.zeros(nblk_total, jnp.int32).at[
                    bs].max(bs, mode="drop")
                base = jax.lax.associative_scan(jnp.maximum, base)
                g = jnp.arange(nblk_total, dtype=jnp.int32)
                slot_of = jnp.minimum(g - base, nblkmax - 1)
                out = loc3[own, slot_of]              # (nblk_total, 64)
                for j in range(1, M_STRADDLE):
                    lane_j = jnp.maximum(own - j, 0)
                    slot_j = g - bs[lane_j]
                    okm = (own - j >= 0) & (slot_j >= 0) \
                        & (slot_j < nblkmax)
                    vals = loc3[lane_j,
                                jnp.clip(slot_j, 0, nblkmax - 1)]
                    out = out + jnp.where(okm[:, None], vals, 0)
                out = out.reshape(n_img, nblk_img, 64)
        else:
            tail = jnp.arange(steps, dtype=jnp.int32)[:, None] >= i_end
            buf_i = jnp.where(tail, st_end[5][None, :], buf_i)
            buf_v = jnp.where(tail, 0, buf_v)
            flat_i = buf_i.T.reshape(-1)       # lane-major -> sorted
            flat_v = buf_v.T.reshape(-1)
            if "noscatter" in ablate:  # fake: reshape instead of scatter
                need = nblk_total * 64
                pad = max(0, need - flat_v.size)
                out = jnp.concatenate(
                    [flat_v, jnp.zeros(pad, jnp.int32)])[:need]
            else:
                out = jnp.zeros(nblk_total * 64 + 64, jnp.int32)
                out = out.at[flat_i].add(flat_v, indices_are_sorted=True)
                out = out[: nblk_total * 64]
            out = out.reshape(n_img, nblk_img, 64)
            # zigzag -> natural order (dense static permutation)
            if "noperm" not in ablate:
                out = out[:, :, jnp.asarray(np.argsort(zz))]

        # DC diffs -> absolute: segmented inclusive scan per component.
        # Reset positions derive from the per-image restart span: comp
        # ci resets exactly where blk % ri_blk == its first slot offset
        # (restart segments start on MCU boundaries, so the offsets are
        # segment-invariant).
        comp_seq = jnp.tile(jnp.asarray(comp_of_arr), mcus)  # (nblk_img,)
        blk_ar = jnp.arange(nblk_img, dtype=jnp.int32)
        blk_mod = blk_ar[None, :] % ri_blk[:, None]    # (N, nblk_img)
        dc = out[:, :, 0]
        acc = jnp.zeros_like(dc)
        for ci in range(int(comp_of_arr.max()) + 1):
            if "nodc" in ablate:
                break
            first_off = int(np.nonzero(comp_of_arr == ci)[0][0])
            m = comp_seq == ci
            x = jnp.where(m[None, :], dc, 0)
            f = (blk_mod == first_off) & m[None, :]

            def op(a, b):
                av, af = a
                bv, bf = b
                return (bv + jnp.where(bf, 0, av), af | bf)

            s, _ = jax.lax.associative_scan(op, (x, f), axis=1)
            acc = acc + jnp.where(m[None, :], s, 0)
        out = out.at[:, :, 0].set(acc)
        if debug:
            return out, ok, i_end, lane_steps
        return out, ok

    return fn


@functools.lru_cache(maxsize=32)
def build_decoder(C: int, n_lanes: int, steps: int, B: int,
                  comp_of: tuple, mcus: int, n_img: int, n_uniq: int = 8,
                  nblkmax: int = 0, single_pass: bool = False,
                  max_passes: int = MAX_PASSES,
                  ablate: str = "", debug: bool = False):
    import jax

    return jax.jit(build_decoder_core(C, n_lanes, steps, B, comp_of,
                                      mcus, n_img, n_uniq, nblkmax,
                                      single_pass, max_passes, ablate,
                                      debug))


@functools.lru_cache(maxsize=64)
def split_indices(comp_sig):
    """Static per-component gather indices: grid flat position ->
    scan-order block index (inverse of scatter_layout; every real grid
    position appears exactly once in the scan)."""
    out_idx, _, total = scatter_layout(comp_sig)
    inv = np.zeros(total, np.int32)
    real = out_idx < total
    inv[out_idx[real]] = np.nonzero(real)[0].astype(np.int32)
    bases = np.cumsum([0] + [c[0] * c[1] for c in comp_sig])[:-1]
    return [inv[bases[ci] : bases[ci] + bh * bw]
            for ci, (bh, bw, _, _) in enumerate(comp_sig)]


def split_planes(out, comp_sig):
    """(N, mcus*B, 64) scan-order blocks -> tuple of (N, bh, bw, 64)
    per-component planes (device-side static gather)."""
    import jax.numpy as jnp

    n_img = out.shape[0]
    return tuple(
        out[:, jnp.asarray(idx), :].reshape(
            n_img, comp_sig[ci][0], comp_sig[ci][1], 64)
        for ci, idx in enumerate(split_indices(comp_sig)))


def decode_planes(batch: ScanBatch, outs=None):
    """Run the device decoder and split scan-order blocks into
    per-component natural-order planes (host-side numpy finishing for
    tests; the pipeline keeps everything on device via
    build_plane_splitter)."""
    import jax.numpy as jnp

    fn = build_decoder(*batch.static_key())
    out, ok = fn(*[jnp.asarray(a) for a in batch.args()])
    out = np.asarray(out)
    if not bool(np.asarray(ok)):
        return None
    sig = batch.comp_sig
    out_idx, _, total = scatter_layout(sig)
    n_img = out.shape[0]
    flat = np.zeros((n_img, total + 1, 64), np.int32)
    flat[:, out_idx] = out
    bases = np.cumsum([0] + [c[0] * c[1] for c in sig])[:-1]
    return [flat[:, bases[ci] : bases[ci] + bh * bw]
            .reshape(n_img, bh, bw, 64)
            for ci, (bh, bw, _, _) in enumerate(sig)]
