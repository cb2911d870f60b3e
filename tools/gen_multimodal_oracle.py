#!/usr/bin/env python3
"""Independent mirror of the deterministic multimodal fixtures.

Re-derives, with pure math (no AWT / javax.sound / PNG codec), the expected
p11/p38/p39 values: per-seed image features + aHash for syntheticPng, and
per-seed audio features for syntheticWav. Emits Scala arrays for
graft/queries/MultimodalOracle.scala. Because this path shares no code with
ops/Multimodal.scala (different language, no codecs), agreement is a real
differential check: the PNG/WAV containers round-trip losslessly and the
AWT 8x8->8x8 bilinear resize is the identity.

Float semantics mirrored exactly:
- Java double arithmetic == Python float arithmetic (IEEE 754, same op order)
- .toFloat == np.float32 (round-to-nearest-even)
- Spark round(double, n) == Decimal(repr(d)).quantize(HALF_UP): both round
  the SHORTEST decimal repr of the double (BigDecimal.valueOf / Python repr)
"""
import math
from decimal import Decimal, ROUND_HALF_UP
import numpy as np

M1 = np.uint64(0xFF51AFD7ED558CCD)
M2 = np.uint64(0xC4CEB9FE1A85EC53)
S33 = np.uint64(33)


def mix(v):
    z = np.uint64(v & 0xFFFFFFFFFFFFFFFF)
    with np.errstate(over="ignore"):
        z ^= z >> S33
        z *= M1
        z ^= z >> S33
        z *= M2
        z ^= z >> S33
    return int(z)


def spark_round(d, scale):
    """Spark round() on DOUBLE: HALF_UP on BigDecimal.valueOf(d) (shortest repr)."""
    q = Decimal(repr(d)).quantize(Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP)
    return format(q, "f")


def image_seed(seed, w=8, h=8):
    """Pixels of syntheticPng(seed) + decodeImage features + aHash mirror."""
    sum_r = sum_g = sum_b = 0.0
    quad_luma = [0.0] * 4
    quad_n = [0] * 4
    luma = []
    for y in range(h):
        for x in range(w):
            p = mix(seed * 1000003 + y * 1009 + x)
            rgb = p & 0xFFFFFF
            r, g, b = (rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF
            sum_r += r
            sum_g += g
            sum_b += b
            q = (2 if y * 2 >= h else 0) + (1 if x * 2 >= w else 0)
            quad_luma[q] += 0.299 * r + 0.587 * g + 0.114 * b
            quad_n[q] += 1
            luma.append(0.299 * r + 0.587 * g + 0.114 * b)
    n = float(w * h)
    mean_r = float(np.float32(sum_r / n / 255.0))
    mean_luma = float(np.float32((0.299 * sum_r + 0.587 * sum_g + 0.114 * sum_b) / n / 255.0))
    q0 = float(np.float32(quad_luma[0] / quad_n[0] / 255.0))
    # aHash: mean accumulated in the same i=0..63 order, then one bit per pixel
    m = 0.0
    for v in luma:
        m += v
    m /= 64.0
    h64 = 0
    for i, v in enumerate(luma):
        if v > m:
            h64 |= 1 << (63 - i)
    signed = h64 - (1 << 64) if h64 >= (1 << 63) else h64
    return (
        spark_round(mean_r, 4),
        spark_round(mean_luma, 4),
        spark_round(q0, 4),
        signed,
    )


def audio_seed(seed, n_samples=4410, sr=44100):
    """decodeAudio features of syntheticWav(seed): trunc-quantized 0.5*sin."""
    freq = 200.0 + (seed % 40) * 50.0
    samples = []
    for i in range(n_samples):
        v = int(0.5 * math.sin(2 * math.pi * freq * i / sr) * 32767)  # trunc
        samples.append(v / 32768.0)
    sum_sq = peak = 0.0
    zc = 0
    for i, s in enumerate(samples):
        sum_sq += s * s
        peak = max(peak, abs(s))
        if i > 0 and (samples[i - 1] >= 0) != (s >= 0):
            zc += 1
    n = len(samples)
    rms = float(np.float32(math.sqrt(sum_sq / n)))
    zcr = float(np.float32(zc / n))
    peak_f = float(np.float32(peak))
    return (spark_round(rms, 4), spark_round(zcr, 5), spark_round(peak_f, 4))


def sine_samples(seed, n_samples=4410, sr=44100):
    freq = 200.0 + (seed % 40) * 50.0
    return [int(0.5 * math.sin(2 * math.pi * freq * i / sr) * 32767)
            for i in range(n_samples)]


# --- G.711 mirror (canonical CCITT/Sun formulation, ops/AudioCodecs.scala) ---

def _segment(v):
    return 0 if v <= 0 else min(7, v.bit_length() - 1)


def linear2ulaw(pcm):
    sign = 0x80 if pcm < 0 else 0x00
    if pcm < 0:
        pcm = -pcm
    pcm = min(pcm, 32635) + 0x84
    exponent = _segment((pcm >> 7) & 0xFF)
    mantissa = (pcm >> (exponent + 3)) & 0x0F
    return (~(sign | (exponent << 4) | mantissa)) & 0xFF


def ulaw2linear(u):
    u = (~u) & 0xFF
    t = ((((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)) - 0x84
    return -t if (u & 0x80) else t


SEG_AEND = [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF]


def linear2alaw(pcm):
    pcm >>= 3  # arithmetic shift: Python >> on negatives floors, same as Java
    if pcm >= 0:
        mask = 0xD5
    else:
        mask = 0x55
        pcm = -pcm - 1
    pcm = min(pcm, 0xFFF)
    seg = 0
    while pcm > SEG_AEND[seg]:
        seg += 1
    if seg < 2:
        aval = (seg << 4) | ((pcm >> 1) & 0x0F)
    else:
        aval = (seg << 4) | ((pcm >> seg) & 0x0F)
    return (aval ^ mask) & 0xFF


def alaw2linear(b):
    a = (b ^ 0x55) & 0xFF
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


# --- IMA ADPCM mirror (block codec, ops/AudioCodecs.scala) -------------------

STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _clamp16(s):
    return max(-32768, min(32767, s))


def adpcm_roundtrip(samples, block_align=256):
    """Mirror of ImaAdpcm.encode followed by ImaAdpcm.decode (mono)."""
    spb = (block_align - 4) * 2 + 1
    n = len(samples)
    out = []
    for blk in range((n + spb - 1) // spb):
        s0 = blk * spb
        predictor = _clamp16(samples[s0])
        index = 0
        if s0 + 1 < n:
            d = abs(samples[s0 + 1] - predictor)
            while index < 88 and STEP_TABLE[index] < d:
                index += 1
        out.append(predictor)
        for i in range(1, spb):
            if len(out) >= n:
                break
            target = samples[s0 + i] if s0 + i < n else 0
            step = STEP_TABLE[index]
            diff = target - predictor
            nibble = 0
            if diff < 0:
                nibble = 8
                diff = -diff
            vpdiff = step >> 3
            st = step
            if diff >= st:
                nibble |= 4
                diff -= st
                vpdiff += st
            st >>= 1
            if diff >= st:
                nibble |= 2
                diff -= st
                vpdiff += st
            st >>= 1
            if diff >= st:
                nibble |= 1
                vpdiff += st
            predictor = _clamp16(
                predictor - vpdiff if (nibble & 8) else predictor + vpdiff)
            index = max(0, min(88, index + INDEX_TABLE[nibble]))
            out.append(predictor)
    return out[:n]


def lossy_seed(seed, codec):
    """Features of syntheticCompandedWav(seed, codec) through the real
    decode path: encode→decode→DSP, mirroring ops/AudioCodecs.scala with
    zero shared code (the cross-language differential that makes the p73
    literals an independent oracle)."""
    pcm = sine_samples(seed)
    if codec == "ulaw":
        dec = [ulaw2linear(linear2ulaw(v)) for v in pcm]
    elif codec == "alaw":
        dec = [alaw2linear(linear2alaw(v)) for v in pcm]
    else:
        dec = adpcm_roundtrip(pcm)
    samples = [v / 32768.0 for v in dec]
    sum_sq = peak = 0.0
    zc = 0
    for i, s in enumerate(samples):
        sum_sq += s * s
        peak = max(peak, abs(s))
        if i > 0 and (samples[i - 1] >= 0) != (s >= 0):
            zc += 1
    n = len(samples)
    rms = float(np.float32(math.sqrt(sum_sq / n)))
    zcr = float(np.float32(zc / n))
    peak_f = float(np.float32(peak))
    return (spark_round(rms, 4), spark_round(zcr, 5), spark_round(peak_f, 4))


# --- uncompressed-AVI mirror (ops/Multimodal.scala syntheticAvi/decodeAviVideo)

def _avi_n_frames(seed):
    return 6 + (seed % 40) % 4


def video_seed(seed, w=15, h=10):
    """decodeAviVideo features of syntheticAvi(seed): whole-video RGB/luma
    pooling + per-temporal-quarter luma, accumulated in the decoder's exact
    order (frames, then STORED bottom-up rows, then x)."""
    n_frames = _avi_n_frames(seed)
    sum_r = sum_g = sum_b = 0.0
    q_luma = [0.0] * 4
    q_n = [0] * 4
    for f in range(n_frames):
        q = min(3, f * 4 // n_frames)
        for row in range(h):
            y = h - 1 - row  # DIB rows are stored bottom-up
            for x in range(w):
                p = mix(seed * 1000003 + f * 7919 + y * 1009 + x)
                rgb = p & 0xFFFFFF
                r, g, b = (rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF
                sum_r += r
                sum_g += g
                sum_b += b
                q_luma[q] += 0.299 * r + 0.587 * g + 0.114 * b
                q_n[q] += 1
    n = float(n_frames * w * h)
    mean_r = float(np.float32(sum_r / n / 255.0))
    mean_luma = float(np.float32(
        (0.299 * sum_r + 0.587 * sum_g + 0.114 * sum_b) / n / 255.0))
    tq0 = float(np.float32(q_luma[0] / q_n[0] / 255.0))
    tq3 = float(np.float32(q_luma[3] / q_n[3] / 255.0))
    return (n_frames, spark_round(mean_r, 4), spark_round(mean_luma, 4),
            spark_round(tq0, 4), spark_round(tq3, 4))


# --- BI_RLE8 AVI mirror (ops/Multimodal.scala syntheticRleAvi/decodeRle8Video)

def _rle_n_frames(seed):
    return 5 + (seed % 40) % 4


def rle_video_seed(seed, w=16, h=12):
    """decodeRle8Video features of syntheticRleAvi(seed): the decoder pools
    the RECONSTRUCTED palettized frames; the mirror re-derives the same
    pixels from the content formula (static per-row background + moving
    4x3 rect), so agreement proves the whole encode->P-frame->decode chain."""
    k = seed % 40
    n_frames = _rle_n_frames(seed)
    pal = []
    for c in range(64):
        rgb = mix(k * 31 + c) & 0xFFFFFF
        pal.append(((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF))
    sum_r = sum_g = sum_b = 0.0
    q_luma = [0.0] * 4
    q_n = [0] * 4
    for f in range(n_frames):
        q = min(3, f * 4 // n_frames)
        rx = (k + 3 * f) % (w - 4)
        ry = (k // 7 + 2 * f) % (h - 3)
        for row in range(h):
            y = h - 1 - row  # decoder pools the bottom-up buffer linearly
            for x in range(w):
                in_rect = rx <= x < rx + 4 and ry <= y < ry + 3
                idx = (k + f + x + y) % 64 if in_rect else (k * 5 + y) % 64
                r, g, b = pal[idx]
                sum_r += r
                sum_g += g
                sum_b += b
                q_luma[q] += 0.299 * r + 0.587 * g + 0.114 * b
                q_n[q] += 1
    n = float(n_frames * w * h)
    mean_r = float(np.float32(sum_r / n / 255.0))
    mean_luma = float(np.float32(
        (0.299 * sum_r + 0.587 * sum_g + 0.114 * sum_b) / n / 255.0))
    tq0 = float(np.float32(q_luma[0] / q_n[0] / 255.0))
    tq3 = float(np.float32(q_luma[3] / q_n[3] / 255.0))
    return (n_frames, spark_round(mean_r, 4), spark_round(mean_luma, 4),
            spark_round(tq0, 4), spark_round(tq3, 4))


def video_frame_seed(seed, f, w=15, h=10):
    """decodeImage features of frame f re-wrapped as BMP by aviKeyframes:
    the image decoder's top-down y iteration over the same pixel hash."""
    sum_r = sum_g = sum_b = 0.0
    quad_luma = [0.0] * 4
    quad_n = [0] * 4
    for y in range(h):
        for x in range(w):
            p = mix(seed * 1000003 + f * 7919 + y * 1009 + x)
            rgb = p & 0xFFFFFF
            r, g, b = (rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF
            sum_r += r
            sum_g += g
            sum_b += b
            q = (2 if y * 2 >= h else 0) + (1 if x * 2 >= w else 0)
            quad_luma[q] += 0.299 * r + 0.587 * g + 0.114 * b
            quad_n[q] += 1
    n = float(w * h)
    mean_r = float(np.float32(sum_r / n / 255.0))
    mean_luma = float(np.float32(
        (0.299 * sum_r + 0.587 * sum_g + 0.114 * sum_b) / n / 255.0))
    q0 = float(np.float32(quad_luma[0] / quad_n[0] / 255.0))
    return (spark_round(mean_r, 4), spark_round(mean_luma, 4),
            spark_round(q0, 4))


def fmt_rows(rows, per_line):
    lines = []
    for i in range(0, len(rows), per_line):
        lines.append("    " + ", ".join(rows[i : i + per_line]) + ",")
    out = "\n".join(lines)
    return out.rstrip(",").rstrip() if not out else out[: out.rfind(",")]


def main():
    imgs = [image_seed(s) for s in range(300)]
    auds = [audio_seed(s) for s in range(40)]

    print("  // generated by tools/gen_multimodal_oracle.py — do not hand-edit")
    print("  val imageHash: Array[Long] = Array(")
    print(fmt_rows([f"{h}L" for _, _, _, h in imgs], 4))
    print("  )")
    print()
    print("  /** (mean_r, mean_luma, q0_luma) per seed, pre-rounded like the query. */")
    print("  val imageFeat: Array[(String, String, String)] = Array(")
    print(fmt_rows([f'("{a}", "{b}", "{c}")' for a, b, c, _ in imgs], 3))
    print("  )")
    print()
    print("  /** (rms, zcr, peak) per audio seed, pre-rounded like the query. */")
    print("  val audioFeat: Array[(String, String, String)] = Array(")
    print(fmt_rows([f'("{a}", "{b}", "{c}")' for a, b, c in auds], 3))
    print("  )")
    print()
    print("  /** (codec, seed) -> (rms, zcr, peak) through the native lossy")
    print("    * codecs (G.711 u/A-law, IMA ADPCM), re-derived by the Python")
    print("    * encode+decode mirror — codec-major, 40 seeds each. */")
    print("  val lossyFeat: Array[(String, String, String, String)] = Array(")
    rows = []
    for codec in ("ulaw", "alaw", "adpcm"):
        for s in range(40):
            a, b, c = lossy_seed(s, codec)
            rows.append(f'("{codec}", "{a}", "{b}", "{c}")')
    print(fmt_rows(rows, 2))
    print("  )")
    print()
    print("  /** (n_frames, mean_r, mean_luma, tq0, tq3) per video seed —")
    print("    * whole-video decodeAviVideo features via the Python mirror. */")
    print("  val videoFeat: Array[(Int, String, String, String, String)] = Array(")
    vids = [video_seed(s) for s in range(40)]
    print(fmt_rows([f'({n}, "{a}", "{b}", "{c}", "{d}")'
                    for n, a, b, c, d in vids], 2))
    print("  )")
    print()
    print("  /** (n_frames, mean_r, mean_luma, tq0, tq3) per BI_RLE8 video")
    print("    * seed — decodeRle8Video features via the Python mirror. */")
    print("  val rleVideoFeat: Array[(Int, String, String, String, String)] = Array(")
    rvids = [rle_video_seed(s) for s in range(40)]
    print(fmt_rows([f'({n}, "{a}", "{b}", "{c}", "{d}")'
                    for n, a, b, c, d in rvids], 2))
    print("  )")
    print()
    print("  /** (seed, frame_idx, mean_r, mean_luma, q0) for every-2nd")
    print("    * keyframe — per-frame decodeImage features via the mirror. */")
    print("  val videoFrameFeat: Array[(Int, Int, String, String, String)] = Array(")
    rows = []
    for s in range(40):
        for f in range(0, _avi_n_frames(s), 2):
            a, b, c = video_frame_seed(s, f)
            rows.append(f'({s}, {f}, "{a}", "{b}", "{c}")')
    print(fmt_rows(rows, 2))
    print("  )")


if __name__ == "__main__":
    main()
