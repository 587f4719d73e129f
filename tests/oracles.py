"""CPU oracles: the reference chain's formulas implemented verbatim in
numpy/scipy float64 (SURVEY.md §4 — the reference itself has no tests, so
these oracles ARE the behavioral spec the device kernels are diffed against).

Each function cites the reference site it transcribes semantically.
pydub/audioop are not installed here; their semantics are encoded from the
pydub-0.25 effects/audioop behavior described in SURVEY.md N7/C10.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import butter, lfilter, sosfilt


# --- format converters (engine:250-257, quirk Q5) --------------------------

def float_to_int16(x):
    return np.trunc(np.clip(x, -1.0, 1.0) * 32767.0)


def int16_to_float(i):
    return i / 32768.0


def int16_roundtrip(x):
    return float_to_int16(x) / 32768.0


# --- shelf / peak (engine:283-298) ------------------------------------------

def apply_shelf_filter(samples, sample_rate, cutoff_hz, gain_db, filter_type):
    if gain_db == 0.0:
        return samples
    b, a = butter(2, cutoff_hz / (0.5 * sample_rate), btype=filter_type)
    y = lfilter(b, a, samples, axis=0)
    gain = 10.0 ** (gain_db / 20.0)
    if gain_db > 0:
        return samples + (y - samples) * (gain - 1)
    return samples * gain + (y - samples * gain)  # == y (quirk Q1)


def apply_peak_filter(samples, sample_rate, center_hz, gain_db, q=1.41):
    if gain_db == 0:
        return samples
    nyquist = 0.5 * sample_rate
    center_norm = center_hz / nyquist
    bandwidth = center_norm / q
    low = center_norm - bandwidth / 2
    high = center_norm + bandwidth / 2
    if low <= 0:
        low = 1e-9
    if high >= 1.0:
        high = 0.999999
    sos = butter(4, [low, high], btype="bandpass", output="sos")
    band = sosfilt(sos, samples, axis=0)
    gain_factor = 10 ** (gain_db / 20.0)
    return samples + band * (gain_factor - 1)


def apply_eq(samples, sample_rate, settings):
    """engine:272-282 — per-channel chain, float32 in-place downcast (Q10)."""
    s = np.array(samples, np.float32)

    def chan(c):
        c = apply_shelf_filter(c, sample_rate, 250,
                               settings.get("bass_boost", 0.0), "low")
        c = apply_peak_filter(c, sample_rate, 1000,
                              -settings.get("mid_cut", 0.0))
        c = apply_peak_filter(c, sample_rate, 4000,
                              settings.get("presence_boost", 0.0))
        c = apply_shelf_filter(c, sample_rate, 8000,
                               settings.get("treble_boost", 0.0), "high")
        return c

    if s.ndim == 2:
        for i in range(s.shape[1]):
            s[:, i] = chan(s[:, i].astype(np.float64))
    else:
        s = chan(s)
    return s


# --- stereo width (engine:267-271) ------------------------------------------

def apply_stereo_width(samples, width):
    if samples.ndim != 2 or samples.shape[1] != 2:
        return samples
    left, right = samples[:, 0], samples[:, 1]
    mid, side = (left + right) / 2, (left - right) / 2
    side = side * width
    return np.stack([np.clip(mid + side, -1, 1),
                     np.clip(mid - side, -1, 1)], axis=1)


# --- analog character (engine:258-266) --------------------------------------

def apply_analog_character(x_float, sample_rate, character_percent):
    """Input/output in float; caller handles the int16 boundary (Q5)."""
    if character_percent == 0:
        return x_float
    factor = character_percent / 100.0
    drive = 1.0 + factor * 0.5
    y = np.tanh(x_float * drive)
    y = apply_shelf_filter(y, sample_rate, 120, factor * 1.0, "low")
    y = apply_shelf_filter(y, sample_rate, 12000, factor * 1.5, "high")
    return y


# --- pydub compress_dynamic_range (N7) --------------------------------------

def pydub_compress(x_int, sample_rate, threshold_db, ratio,
                   attack_ms=5.0, release_ms=50.0):
    """x_int: [N, C] int16-valued array. Sequential reference loop."""
    n, c = x_int.shape
    look = int(attack_ms * sample_rate / 1000.0)
    attack_frames = attack_ms * sample_rate / 1000.0
    release_frames = release_ms * sample_rate / 1000.0
    thresh_rms = 32768.0 * 10.0 ** (threshold_db / 20.0)

    sq = np.sum(x_int.astype(np.float64) ** 2, axis=1)
    csum = np.concatenate([[0.0], np.cumsum(sq)])
    out = np.empty_like(x_int)
    att = 0.0
    for i in range(n):
        if i < look:
            rms = 0.0  # pydub: negative slice start wraps -> empty -> rms 0
        else:
            rms = float(int(np.sqrt((csum[i] - csum[i - look])
                                    / (look * c))))
        if rms > 0:
            db_over = max(20.0 * np.log10(rms / thresh_rms), 0.0)
        else:
            db_over = 0.0
        max_att = (1.0 - 1.0 / ratio) * db_over
        if rms > thresh_rms and att <= max_att:
            att = min(att + max_att / attack_frames, max_att)
        else:
            att = max(att - max_att / release_frames, 0.0)
        if att != 0.0:
            frame = np.trunc(x_int[i] * 10.0 ** (-att / 20.0))
            out[i] = np.clip(frame, -32768, 32767)
        else:
            out[i] = x_int[i]
    return out


def saturating_add(a, b):
    return np.clip(a + b, -32768.0, 32767.0)


def multiband_compress(x_float, sample_rate, settings,
                       low_crossover=250.0, high_crossover=4000.0):
    """engine:299-309: subtractive crossover (Q4), per-band int16 (Q5),
    pydub compression, overlay saturating adds (Q7). In/out int16-valued."""
    x = np.asarray(x_float, np.float64)
    low_sos = butter(4, low_crossover, btype="lowpass", fs=sample_rate,
                     output="sos")
    high_sos = butter(4, high_crossover, btype="highpass", fs=sample_rate,
                      output="sos")
    low = sosfilt(low_sos, x, axis=0)
    high = sosfilt(high_sos, x, axis=0)
    mid = x - low - high
    bands = []
    for band, th, ra in [
        (low, settings.get("low_thresh"), settings.get("low_ratio")),
        (mid, settings.get("mid_thresh"), settings.get("mid_ratio")),
        (high, settings.get("high_thresh"), settings.get("high_ratio")),
    ]:
        band_int = float_to_int16(band)
        bands.append(pydub_compress(band_int, sample_rate, th, ra))
    out = saturating_add(saturating_add(bands[0], bands[1]), bands[2])
    return out


# --- BS.1770 integrated loudness (oracle for N3) ----------------------------

def k_weighting_sos(fs):
    """K-weighting SOS built HERE, independent of ame_tpu (the oracle must
    not trust the code under test — round-3 verdict weak #6). Derivation:
    ITU-R BS.1770-4 publishes the two digital stages only at 48 kHz; the
    analog prototypes recovered from that table (head-model high shelf
    f0=1681.97 Hz / +4 dB / Q=0.7072, RLB highpass f0=38.135 Hz /
    Q=0.5003) are bilinear-transformed at the working rate with frequency
    prewarping, via scipy.signal.bilinear — a different derivation path
    from dsp/design.py's hand-rolled RBJ-style formulation.
    """
    from scipy.signal import bilinear
    f0, gain_db, q = 1681.974450955533, 3.999843853973347, 0.7071752369554196
    vb_exp = 0.4996667741545416
    fhp, qhp = 38.13547087602444, 0.5003270373238773
    # prewarped analog prototype -> bilinear(fs): wc = 2 fs tan(pi f0 / fs)
    # makes scipy's non-prewarping bilinear land the pole exactly at f0.
    wc = 2.0 * fs * np.tan(np.pi * f0 / fs)
    vh = 10.0 ** (gain_db / 20.0)
    vb = vh ** vb_exp
    b1, a1 = bilinear([vh, vb * wc / q, wc * wc],
                      [1.0, wc / q, wc * wc], fs)
    wh = 2.0 * fs * np.tan(np.pi * fhp / fs)
    b2, a2 = bilinear([1.0, 0.0, 0.0], [1.0, wh / qhp, wh * wh], fs)
    # the spec leaves the RLB numerator UNNORMALIZED at [1, -2, 1]; the
    # cascade's resulting ~+0.691 dB at 997 Hz is offset in the LUFS sum
    b2 = b2 / b2[0]
    return np.array([np.concatenate([b1, a1]), np.concatenate([b2, a2])])


_KW_DYN_CACHE = {}


def k_weighting_dynamic_sos(fs):
    """K-weighting in ffmpeg's DYNAMIC-mode meter domain, derived HERE
    independently of ame_tpu: loudnorm's dynamic path upsamples to 192 kHz
    and meters there (pinned by tests/test_golden_ffmpeg.py), so the
    equivalent native-rate cascade is this oracle's own bilinear design
    plus one RBJ high shelf least-squares-fit so the composite magnitude
    matches the 192 kHz design in-band (same spec-level fact, different
    derivation path from dsp/design.k_weighting_dynamic_sos)."""
    fs = float(fs)
    if fs in _KW_DYN_CACHE:
        return _KW_DYN_CACHE[fs]
    base = k_weighting_sos(fs)
    if fs >= 191999.0:
        _KW_DYN_CACHE[fs] = base
        return base
    from scipy.signal import sosfreqz
    from scipy.optimize import least_squares

    def shelf(p):
        g, lf0, lq = p
        K = np.tan(np.pi * np.exp(lf0) / fs)
        vh = 10.0 ** (g / 20.0)
        vb = np.sqrt(vh)
        q = np.exp(lq)
        a0 = 1.0 + K / q + K * K
        return np.array([[(vh + vb * K / q + K * K) / a0,
                          2.0 * (K * K - vh) / a0,
                          (vh - vb * K / q + K * K) / a0,
                          1.0, 2.0 * (K * K - 1.0) / a0,
                          (1.0 - K / q + K * K) / a0]])

    f = np.linspace(20.0, 0.49 * fs, 1024)
    _, h_n = sosfreqz(base, worN=f, fs=fs)
    _, h_t = sosfreqz(k_weighting_sos(192000.0), worN=f, fs=192000.0)
    t_db = 20.0 * np.log10(np.maximum(np.abs(h_t), 1e-12)
                           / np.maximum(np.abs(h_n), 1e-12))

    def resid(p):
        _, h_c = sosfreqz(shelf(p), worN=f, fs=fs)
        return 20.0 * np.log10(np.maximum(np.abs(h_c), 1e-12)) - t_db

    sol = least_squares(resid, x0=[float(t_db[-1]), np.log(1681.97),
                                   np.log(0.7)], method="lm")
    out = np.concatenate([base, shelf(sol.x)], axis=0)
    _KW_DYN_CACHE[fs] = out
    return out


def integrated_lufs(x, sample_rate):
    """Gated integrated loudness, float64, independent of the device impl."""
    sos = k_weighting_sos(sample_rate)
    y = sosfilt(sos, np.asarray(x, np.float64), axis=0)
    if y.ndim == 1:
        y = y[:, None]
    block = int(round(0.400 * sample_rate))
    hop = int(round(0.100 * sample_rate))
    n_blocks = (y.shape[0] - block) // hop + 1
    if n_blocks < 1:
        return -np.inf
    power = []
    for j in range(n_blocks):
        seg = y[j * hop: j * hop + block]
        power.append(np.sum(np.mean(seg ** 2, axis=0)))
    power = np.array(power)
    loud = -0.691 + 10 * np.log10(np.maximum(power, 1e-30))
    abs_gate = loud > -70.0
    if not np.any(abs_gate):
        return -np.inf
    rel_thresh = (-0.691 + 10 * np.log10(power[abs_gate].mean())) - 10.0
    gate = abs_gate & (loud > rel_thresh)
    if not np.any(gate):
        return -np.inf
    return -0.691 + 10 * np.log10(power[gate].mean())


# --- ffmpeg alimiter gain planner (oracle for N4) ---------------------------

def alimiter_gain(peak, sample_rate, limit=0.98, attack_ms=5.0,
                  release_ms=50.0):
    """Gain trajectory of the alimiter planning algorithm (structural
    transcription of the published af_alimiter design — the reference runs
    it as `alimiter=level_in=1:level_out=1:limit=0.98:attack=5:release=50`,
    audio_mastering_engine.py:223):

      * `attack`-length lookahead buffer; when a peak above `limit` enters,
        the gain is planned to descend LINEARLY so it reaches limit/peak
        exactly when that peak exits; the steepest pending descent governs
        (the nextpos/nextdelta plan queue, expressed here as the greedy
        per-step minimum over the lookahead window — same trajectory).
      * release ascends linearly at (1 - limit/peak)/(release*rate) of the
        governing peak — i.e. full recovery takes `release` seconds
        regardless of depth.
      * asc (auto-release) is NOT modeled — the reference does not enable
        it.

    peak: [N] channel-linked |x * level_in|. Returns gain[n] aligned to the
    sample it scales (the buffer-exit alignment; ffmpeg additionally delays
    the output by the attack length, which the offline rebuild compensates).
    Float64, O(N*attack) — test fixtures only.
    """
    A = max(int(round(attack_ms * sample_rate / 1000.0)), 1)
    Rs = release_ms * sample_rate / 1000.0
    patt = np.minimum(1.0, limit / np.maximum(np.asarray(peak, np.float64),
                                              1e-12))
    N = len(patt)
    ext = np.concatenate([patt, np.ones(A)])
    steps = np.arange(1, A + 1, dtype=np.float64)
    att = 1.0
    rdelta = (1.0 - limit) / Rs
    gain = np.empty(N)
    for m in range(N):
        need = np.min((ext[m + 1: m + 1 + A] - att) / steps)
        if need < 0.0:
            att += need            # steepest pending descent governs
        else:
            att = min(att + rdelta, 1.0)
        if att >= ext[m] - 1e-15:  # this sample's constraint governs now
            att = min(att, ext[m])
            if ext[m] < 1.0:
                rdelta = (1.0 - ext[m]) / Rs
        gain[m] = att
    return gain


# --- loudnorm dynamic-mode controller (oracle for ops/loudnorm.py) ----------

def loudnorm_dynamic_gains(x, sample_rate, target_i=-14.0, target_tp=-1.5,
                           target_lra=11.0, measured_i=0.0,
                           measured_thresh=-70.0, offset=0.0):
    """Sequential float64 reference of ffmpeg loudnorm's dynamic-mode
    controller, reconstructed by black-box probing of the REAL filter
    (tests/test_golden_ffmpeg.py drives it in-process; every rule below was
    pinned by a targeted experiment, see the golden tests). Returns (g0, g1)
    per-frame gain pairs. ops/loudnorm._dynamic_jit implements the same spec
    fully in parallel and is cross-checked against this loop.

    The pinned behaviors (each overriding a round-3 doc-derived guess):
      * every delta carries 10**(offset/20) — the ``offset`` option IS a
        global trajectory shift in dynamic mode (it is ignored in linear
        mode); varying it moves the whole gain curve 1:1.
      * quiet-start state machine: when the 3 s priming shortterm is below
        measured_thresh the controller starts UNLATCHED with
        delta0 = offset + target_i - measured_i and each frame whose input
        shortterm exceeds measured_thresh multiplies the pending gain by
        1.0058 (+0.05 dB); deltas hold that crept value until the OUTPUT
        3 s shortterm first reaches the ABSOLUTE target_i (latch) — with a
        strongly negative offset the latch never fires and the entire run
        is creep-shaped (verified: offset=-5 on an alternating signal).
      * there is NO below-MEASURED-thresh hold post-latch (verified:
        thresh -20/-30/-40 produce byte-identical dynamic output on a
        dipping signal) — but there IS a below-RUNNING-RELATIVE-threshold
        hold: a frame with -70 < st < rel repeats the last written delta
        (round 4: pinned per-frame against the real filter via exact
        least-squares gain extraction on its 192 kHz output; round-3's
        "floor the shortterm at rel" emulation was close — identical in
        steady state — but measurably wrong in transitions). st <= -70
        writes the bare-offset delta.
      * the running gated integrated / relative threshold visible when
        writing delta k include the gating block ending at frame k
        itself (round 4: was k-1; the one-block skew cost up to 0.26 dB
        in transitions).
      * the smoothing window trails by 2 frames: gain[f] reads
        deltas[f-2 .. f+18] (fit on transition timing, all signals).
      * EOF flush: gains are frozen from frame F-29 on at the WINDOW
        VALUE OF FRAME F-28 — the real filter computes its flush gain
        one slot ahead of where it freezes (round 4: pinned by exact
        gain extraction on alt; the frame before the freeze already
        takes the frozen value as its g1).

    Round-4 precision: with these rules this oracle matches the real
    filter's per-frame gains within 0.03 dB on every probe family (alt
    0.009, ramp 0.015, multi 0.029, dip 0.002, music-like 0.021, hot
    0.0003 dB) on limiter-idle frames, measured in ffmpeg's own 192 kHz
    processing domain.
    """
    L = int(round(0.100 * sample_rate))
    n = x.shape[0]
    F = -(-n // L)
    xp = np.pad(np.asarray(x, np.float64), ((0, F * L - n), (0, 0)))
    sos = k_weighting_dynamic_sos(sample_rate)   # ffmpeg meters at 192 kHz
    yk = sosfilt(sos, xp, axis=0)
    M0 = np.sum((yk * yk).reshape(F, -1), axis=1)
    peak = np.max(np.abs(xp).reshape(F, -1), axis=1)

    def lufs(p):
        return -0.691 + 10 * np.log10(max(p, 1e-30))

    st = np.full(F, -1e9)
    for f in range(29, F):
        st[f] = lufs(M0[f - 29:f + 1].sum() / (30 * L))
    blk = np.full(F, -1e9)
    for f in range(3, F):
        blk[f] = lufs(M0[f - 3:f + 1].sum() / (4 * L))

    centers = -70.0 + (np.arange(750) + 0.5) * 0.1
    powers = 10.0 ** ((centers + 0.691) / 10.0)
    hist = np.zeros(750)

    def glob_rel_from_hist():
        cnt = hist.sum()
        if cnt == 0:
            return -1e9, -70.0
        rel = lufs((hist * powers).sum() / cnt) - 10.0
        m = hist * (centers > rel)
        if m.sum() == 0:
            return -1e9, rel
        return lufs((m * powers).sum() / m.sum()), rel

    st0 = st[min(29, F - 1)]
    above = st0 >= measured_thresh
    env0 = 0.0 if st0 <= -70.0 else (
        (target_i - st0) if above else (target_i - measured_i))
    delta0 = 10.0 ** ((offset + env0) / 20.0)
    deltas = [delta0] * 30
    prev = delta0
    for j in range(min(30, F)):
        if blk[j] > -70.0:
            hist[int(np.clip((blk[j] + 70.0) / 0.1, 0, 749))] += 1

    w = np.exp(-((np.arange(21) - 10) ** 2) / (2 * 3.5 ** 2))
    w /= w.sum()
    ceil_lin = 10.0 ** (target_tp / 20.0)
    g0_arr = np.zeros(F)
    g1_arr = np.zeros(F)
    out_pow = np.zeros(F)
    ykf = (yk ** 2).reshape(F, L, -1)
    t_rel = np.arange(L) / L

    def window(lo):
        win = deltas[max(lo, 0):lo + 21]
        if lo < 0:
            win = [delta0] * (-lo) + win
        if len(win) < 21:
            win = win + [deltas[-1]] * (21 - len(win))
        return np.dot(w, np.asarray(win))

    for f in range(F):
        g0 = window(f - 2)
        g1 = window(f - 1)
        cap = min(1.0, ceil_lin / max(peak[f] * max(g0, g1), 1e-9))
        g0c, g1c = g0 * cap, g1 * cap
        g0_arr[f], g1_arr[f] = g0c, g1c
        gs = g0c + (g1c - g0c) * t_rel
        out_pow[f] = np.sum(ykf[f] * (gs[:, None] ** 2))

        k = f + 30
        if k >= F:
            continue  # EOF flush: the delta ring is frozen
        if blk[k] > -70.0:
            hist[int(np.clip((blk[k] + 70.0) / 0.1, 0, 749))] += 1
        stk = st[k]
        if not above:
            if stk > measured_thresh:
                prev *= 1.0058
            lo = max(f - 29, 0)
            st_out = lufs(out_pow[lo:f + 1].sum() / ((f + 1 - lo) * L))
            if st_out >= target_i:
                above = True
        glob, rel = glob_rel_from_hist()
        if not above:
            d = prev
        elif stk <= -70.0:
            d = 10.0 ** (offset / 20.0)
        elif stk < rel:
            d = prev                      # below-relative-threshold hold
        else:
            env_g = np.clip(stk - glob, -target_lra / 2, target_lra / 2)
            d = 10.0 ** ((offset + env_g + target_i - stk) / 20.0)
        deltas.append(d)
        prev = d

    # EOF flush: frozen from F-29 at the window value of F-28 (per-frame
    # true-peak caps still apply on the frozen gain)
    fz = max(F - 29, 0)
    if fz < F:
        frozen = window(fz + 1 - 2)
        for f in range(fz, F):
            cap = min(1.0, ceil_lin / max(peak[f] * frozen, 1e-9))
            g0_arr[f] = frozen * cap
            g1_arr[f] = frozen * cap
        if fz >= 1:
            g0u = window(fz - 1 - 2)      # uncapped g0 of the last
            cap = min(1.0, ceil_lin / max(peak[fz - 1]   # unfrozen frame
                                          * max(g0u, frozen), 1e-9))
            g0_arr[fz - 1] = g0u * cap
            g1_arr[fz - 1] = frozen * cap
    return g0_arr, g1_arr
