"""Deterministic synthetic audio clip + transcript table generator.

Shape per BASELINE.json input_hint:
    (clip_id string, bytes binary, sr_hz int, dur_ms int,
     codec string, transcript string, part int)

Generation is DISTRIBUTED (``spark.range`` -> ``mapInPandas``) and
keyed per clip index: every clip's randomness comes from
``np.random.default_rng([seed, clip_idx])``, so output is byte-identical
regardless of partitioning / parallelism — the property the resume and
fidelity tests rely on. At 10^12 rows this generator is embarrassingly
parallel with zero shuffle.

Drift injection (FIXTURES.md §1): per-partition overrides shift the
dur_ms mean (HDDDM/KS positive), reshuffle codec probabilities (PSI
positive), or scale the audio noise variance (kdq positive, mirroring
the reference's ``50 * data`` fixture at
/root/reference/tests/menelaus/data_drift/test_kdq_tree.py:30,52).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from menelaus_spark.audio import (
    FP_SR,
    HOP,
    resample_pcm,
    wav_encode,
    wav_encode_adpcm,
    wav_encode_alaw,
    wav_encode_mulaw,
)

# the real-codec transcoders, in the deterministic idx%3 order the
# "full" near-dup transcode path cycles through
_REAL_ENCODERS = {
    "ulaw": wav_encode_mulaw,
    "alaw": wav_encode_alaw,
    "adpcm": wav_encode_adpcm,
}
_REAL_CYCLE = ("ulaw", "alaw", "adpcm")

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("dur_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("transcript", T.StringType(), True),
        T.StructField("part", T.IntegerType(), False),
    ]
)

SR_CHOICES = np.array([8000, 16000, 22050, 44100, 48000])
SR_PROBS = np.array([0.5, 0.3, 0.1, 0.07, 0.03])
CODEC_CHOICES = np.array(["pcm", "opus", "mp3", "aac", "flac"])
CODEC_PROBS = np.array([0.55, 0.25, 0.12, 0.05, 0.03])  # deliberate Zipf-ish skew
_WORDS = np.array(
    "the a of and to in is on for with audio clip speech sound noise signal "
    "hello world data quick brown fox lazy dog time record voice test".split()
)


def default_drift_spec() -> dict[int, dict]:
    """Reference-like partitions 0..4; drifted partitions later."""
    return {
        5: {"dur_mu_shift": 0.8},             # dur_ms mean shift -> HDDDM/KS fire
        6: {"codec_probs": [0.1, 0.1, 0.15, 0.35, 0.3]},  # PSI fires
        7: {"noise_scale": 50.0},             # feature-space drift -> kdq fires
        # 8, 9, ... unchanged = negative controls
    }


def _synth_clip(rng, d, dur_mu, dur_sigma, dur_clip, test_scale):
    """One clip's (sr, dur, codec, pcm) from an already-positioned rng.
    Consumes draws in the EXACT order of the pre-r04 inline code —
    byte-identity of every existing table configuration depends on it.
    """
    sr = int(rng.choice(SR_CHOICES, p=SR_PROBS))
    if test_scale:
        sr = min(sr, 16000)  # keep byte volume sane in unit tests
    mu = dur_mu + float(d.get("dur_mu_shift", 0.0))
    dur = int(np.clip(np.exp(rng.normal(mu, dur_sigma)), *dur_clip))
    codec_probs = np.asarray(d.get("codec_probs", CODEC_PROBS), dtype=float)
    codec = str(rng.choice(CODEC_CHOICES, p=codec_probs / codec_probs.sum()))
    # audio payload: seeded sine + noise mixture, PCM16 WAV container
    n = max(1, int(round(dur * sr / 1000.0)))
    f0 = rng.uniform(80.0, 1000.0)
    noise_scale = float(d.get("noise_scale", 1.0))
    if "upsample_from" in d:
        # bandwidth fault: synthesize at a LOWER rate then stretch
        # to sr — the clip claims sr_hz but its spectrum is empty
        # above upsample_from/2 (audio_bandwidth check fodder)
        sr_low = int(d["upsample_from"])
        n_low = max(1, int(round(dur * sr_low / 1000.0)))
        t = np.arange(n_low, dtype=np.float64) / sr_low
        sig = (0.4 * np.sin(2 * np.pi * f0 * t)
               + 0.05 * noise_scale * rng.standard_normal(n_low))
        sig = resample_pcm(sig, sr_low, sr)
        sig = sig[:n] if sig.size >= n else np.pad(sig, (0, n - sig.size),
                                                  mode="edge")
    else:
        t = np.arange(n, dtype=np.float64) / sr
        sig = (0.4 * np.sin(2 * np.pi * f0 * t)
               + 0.05 * noise_scale * rng.standard_normal(n))
    # quality-fault injection (drift-spec keys; extra rng draws only
    # happen in partitions that request them, so clean partitions
    # stay byte-identical across configs):
    #   gain: amplifies the signal into int16 saturation (clipping)
    #   silence_frac: fraction of clips replaced by digital silence
    #   dc_offset: constant bias added to the waveform (broken-ADC
    #   fault; no rng draws, so clean partitions stay byte-identical)
    sig = sig * float(d.get("gain", 1.0)) + float(d.get("dc_offset", 0.0))
    pcm = np.clip(sig * 32767.0, -32768, 32767).astype(np.int16)
    if "silence_frac" in d and rng.random() < float(d["silence_frac"]):
        pcm = np.zeros(n, dtype=np.int16)
    return sr, dur, codec, pcm


def _draw_transcript(rng, d, null_frac, dur):
    """Transcript draws, in the original order: seeded token sequence,
    length ~ duration; words_per_s overrides the token rate
    (transcript-rate faults)."""
    if null_frac > 0 and rng.random() < null_frac:
        return None
    # boilerplate_frac: replaces the transcript with one fixed string —
    # the heavy-hitter flood fault (hotkey:<col> check fodder). The
    # extra rng draw only happens in partitions that request the key.
    if "boilerplate_frac" in d and rng.random() < float(d["boilerplate_frac"]):
        return "thank you for watching"
    if "words_per_s" in d:
        n_tok = max(1, int(round(dur / 1000.0 * float(d["words_per_s"]))))
    else:
        n_tok = max(1, int(dur / 400))
    return " ".join(rng.choice(_WORDS, size=n_tok))


def _gen_rows(
    ids: np.ndarray,
    seed: int,
    n_parts: int,
    rows_per_part: int,
    drift: dict[int, dict],
    null_frac: float,
    dup_frac: float,
    dur_mu: float,
    dur_sigma: float,
    dur_clip: tuple[int, int],
    test_scale: bool,
    neardup_frac: float = 0.0,
    neardup_modes: tuple = ("gain", "resample"),
    real_codecs: bool = False,
) -> pd.DataFrame:
    out = {k: [] for k in ("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript", "part")}
    neardup_m = max(2, int(round(1.0 / neardup_frac))) if neardup_frac > 0 else 0
    for idx in ids:
        idx = int(idx)
        part = min(idx // rows_per_part, n_parts - 1)
        d = drift.get(part, {})
        rng = np.random.default_rng([seed, idx])
        # clip_id (configurable duplicate fraction for uniqueness tests)
        if dup_frac > 0 and idx > 0 and rng.random() < dup_frac:
            clip_id = f"clip_{idx - 1:012d}"
        else:
            clip_id = f"clip_{idx:012d}"
        if neardup_m and idx > 0 and idx % neardup_m == neardup_m - 1:
            # near-duplicate injection (opt-in; every clip_id keyed
            # deterministically, so output stays partition-independent):
            # regenerate clip idx-1's payload + transcript by replaying
            # its exact draw sequence, then apply a mechanical-copy
            # modification keyed by the dup's OWN rng — gain shift
            # and/or downsample-to-half-rate (re-encoded copy classes
            # that exact byte dedup cannot see, audio_neardup fodder)
            src = idx - 1
            part_s = min(src // rows_per_part, n_parts - 1)
            d_s = drift.get(part_s, {})
            rng_s = np.random.default_rng([seed, src])
            if dup_frac > 0 and src > 0:
                rng_s.random()  # mirror the source's clip_id draw
            sr_s, dur_s, codec_s, pcm_s = _synth_clip(
                rng_s, d_s, dur_mu, dur_sigma, dur_clip, test_scale)
            transcript = _draw_transcript(rng_s, d_s, null_frac, dur_s)
            sr_out = sr_s
            if neardup_modes == ("mixed",):
                # full-taxonomy fixture: each dup draws its copy class
                # from its OWN rng (deterministic per idx) — fodder for
                # the end-to-end dedup RESOLUTION pipeline, which must
                # union all matching paths to cover every class
                cls = str(rng.choice(["default", "trim", "noise", "speed", "pad"]))
            elif len(neardup_modes) == 1 and neardup_modes[0] in (
                "trim", "noise", "speed", "pad"
            ):
                cls = neardup_modes[0]
            else:
                cls = "default"
            if cls == "trim":
                # truncated-recording copy: keep a prefix aligned to the
                # canonical fingerprint frame grid (HOP samples at FP_SR),
                # metadata updated to the true shorter duration — the
                # shingle path's containment score is the detector
                step = max(1, int(round(HOP * sr_s / FP_SR)))
                n_keep = max(step, (pcm_s.size // 2 // step) * step)
                pcm_d = pcm_s[:n_keep]
                dur_s = int(round(1000.0 * n_keep / sr_s))
            elif cls == "noise":
                # noise-contaminated copy (re-recording / lossy channel):
                # additive white noise at a drawn SNR — same length, same
                # transcript; the transcript path's masked-BER is the
                # detector (margin-cleared bits survive >=20 dB noise,
                # measured: wBER 0 at 20 dB vs >=0.21 for distinct pairs)
                x = pcm_s.astype(np.float64) / 32768.0
                snr_db = float(rng.choice([20.0, 25.0, 30.0]))
                p_sig = float(np.mean(x * x))
                sigma = np.sqrt(p_sig / 10.0 ** (snr_db / 10.0)) if p_sig > 0 else 0.0
                x = x + rng.normal(0.0, sigma, x.size)
                pcm_d = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int16)
            elif cls == "speed":
                # speed-perturbed copy: resampled by f WITHOUT
                # relabeling the rate — plays faster/slower, pitch
                # shifts by f; duration metadata updated to the true
                # played length. Detected by speed_blocked_neardup's
                # rescaled peak-track criterion (frame-grid
                # fingerprints all break)
                spd = float(rng.choice([0.9, 1.1]))
                x = pcm_s.astype(np.float64) / 32768.0
                x = resample_pcm(x, sr_s, int(round(sr_s / spd)))
                pcm_d = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int16)
                dur_s = int(round(1000.0 * pcm_d.size / sr_s))
            elif cls == "pad":
                # silence-padded copy: leading digital silence aligned to
                # the canonical fingerprint frame grid, metadata updated
                # to the true longer duration — silence frames collapse
                # to O(1) distinct shingles, so the shingle path's
                # containment (=1.0) and even plain Jaccard stay high
                step = max(1, int(round(HOP * sr_s / FP_SR)))
                n_pad = step * int(rng.integers(4, 13))
                pcm_d = np.concatenate(
                    [np.zeros(n_pad, dtype=np.int16), pcm_s])
                dur_s = int(round(1000.0 * pcm_d.size / sr_s))
            else:
                x = pcm_s.astype(np.float64) / 32768.0
                # resample mode only when sr/2 >= the canonical
                # fingerprint rate — copies below it genuinely lose
                # high-band content
                mode = int(rng.integers(0, 3)) if sr_s >= 16000 else 0
                if mode in (0, 2):
                    x = x * float(rng.choice([0.5, 0.7, 1.2]))
                if mode in (1, 2):
                    sr_out = sr_s // 2
                    x = resample_pcm(x, sr_s, sr_out)
                pcm_d = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int16)
            if real_codecs == "full":
                # "full": the transcode target cycles deterministically
                # through all three real codecs (mu-law ~38 dB, A-law
                # ~37 dB, IMA ADPCM ~22-29 dB re-encode SNR on this
                # signal class — all above the measured 20 dB
                # fingerprint-matching floor), keyed on idx so output
                # stays partition-independent with no extra rng draws
                codec_d = _REAL_CYCLE[idx % 3]
                buf_d = _REAL_ENCODERS[codec_d](pcm_d, sr_out)
            elif real_codecs:
                # the dup is additionally a G.711 mu-law TRANSCODE of
                # its class-modified payload — the classic lossy
                # re-encode copy (codec label AND byte format change;
                # ~38 dB companding SNR keeps every fingerprint path
                # working on the decoded PCM)
                codec_d, buf_d = "ulaw", wav_encode_mulaw(pcm_d, sr_out)
            else:
                codec_d, buf_d = codec_s, wav_encode(pcm_d, sr_out)
            out["clip_id"].append(clip_id)
            out["bytes"].append(buf_d)
            out["sr_hz"].append(sr_out)
            out["dur_ms"].append(dur_s)
            out["codec"].append(codec_d)
            out["transcript"].append(transcript)
            out["part"].append(part)
            continue
        sr, dur, codec, pcm = _synth_clip(rng, d, dur_mu, dur_sigma,
                                          dur_clip, test_scale)
        transcript = _draw_transcript(rng, d, null_frac, dur)
        if real_codecs and codec == "opus":
            # codec-mixed realism: the "opus" draw becomes an honest
            # G.711 mu-law clip — a label whose BYTE FORMAT actually
            # differs from PCM16 (1 byte/sample, WAV format tag 7) and
            # that decode_clip genuinely decodes. Consumes no rng
            # draws, so real_codecs=False tables stay byte-identical.
            codec = "ulaw"
            buf = wav_encode_mulaw(pcm, sr)
        elif real_codecs == "full" and codec == "mp3":
            # "full" widens the physical-codec mix: "mp3" draws become
            # G.711 A-law (tag 6), "aac" draws become IMA ADPCM (tag
            # 0x11, ~4:1 predictive blocks + fact chunk — a container
            # whose LAYOUT differs from the canonical 44-byte header,
            # not just its sample format). No extra rng draws, so
            # real_codecs=True tables stay byte-identical.
            codec = "alaw"
            buf = wav_encode_alaw(pcm, sr)
        elif real_codecs == "full" and codec == "aac":
            codec = "adpcm"
            buf = wav_encode_adpcm(pcm, sr)
        else:
            buf = wav_encode(pcm, sr)
        # pad_bytes: trailing junk after the data chunk — still fully
        # decodable (the header's data length wins) but inconsistent
        # with (sr_hz, dur_ms), so ONLY the payload-size check fires
        pad = int(d.get("pad_bytes", 0))
        if pad:
            buf += b"\x00" * pad
        # corrupt_frac: payload damage with claimed-good metadata — the
        # bit-rot / interrupted-upload fault class of a 10^12-row
        # corpus. Three kinds, cycled by idx so every class appears:
        #   0 truncated mid-data  -> decode fails AND length lies
        #   1 severed header      -> decode fails AND length lies
        #   2 smashed RIFF magic  -> right length, undecodable: ONLY
        #     decode_integrity can see it (payload_size stays green)
        # Extra rng draws only in partitions that request the key, so
        # clean tables stay byte-identical across configs.
        corrupt = float(d.get("corrupt_frac", 0.0))
        if corrupt and rng.random() < corrupt:
            kind = idx % 3
            if kind == 0:
                keep = 44 + int(rng.integers(0, max(1, (len(buf) - 44) // 2)))
                buf = buf[:keep]
            elif kind == 1:
                buf = buf[: int(rng.integers(4, 44))]
            else:
                buf = b"JUNK" + buf[4:]
        # meta_lie_frac: bad-ingestion metadata — the payload is intact
        # and decodable but the CLAIMED columns lie, in ways invisible
        # to the O(length) payload-size model. Three kinds, cycled by
        # idx: 0 = rate doubled + duration halved (byte count
        # unchanged), 1 = rate halved + duration doubled, 2 = codec
        # label swapped between the equal-rate G.711 companders
        # (mu-law <-> A-law; falls back to kind 0 when the row isn't
        # G.711). Only metadata_consistency (header-vs-claim) can see
        # these. Extra rng draw only in partitions that request the
        # key, so every other configuration stays byte-identical.
        meta_lie = float(d.get("meta_lie_frac", 0.0))
        if meta_lie and rng.random() < meta_lie:
            kind = idx % 3
            if kind == 2 and codec in ("ulaw", "alaw"):
                codec = "alaw" if codec == "ulaw" else "ulaw"
            elif kind == 1:
                sr, dur = sr // 2, dur * 2
            else:
                sr, dur = sr * 2, dur // 2
        out["clip_id"].append(clip_id)
        out["bytes"].append(buf)
        out["sr_hz"].append(sr)
        out["dur_ms"].append(dur)
        out["codec"].append(codec)
        out["transcript"].append(transcript)
        out["part"].append(part)
    pdf = pd.DataFrame(out)
    pdf["sr_hz"] = pdf["sr_hz"].astype("int32")
    pdf["dur_ms"] = pdf["dur_ms"].astype("int32")
    pdf["part"] = pdf["part"].astype("int32")
    return pdf


def audio_table(
    spark: SparkSession,
    n_rows: int = 800,
    n_parts: int = 10,
    seed: int = 42,
    drift: dict[int, dict] | None = None,
    null_frac: float = 0.02,
    dup_frac: float = 0.0,
    dur_mu: float = 6.6,   # exp(6.6) ~ 735 ms at test scale
    dur_sigma: float = 0.5,
    dur_clip: tuple[int, int] = (200, 3000),
    test_scale: bool = True,
    neardup_frac: float = 0.0,
    neardup_modes: tuple = ("gain", "resample"),
    real_codecs: bool = False,
) -> DataFrame:
    """Build the audio table as a distributed DataFrame.

    ``real_codecs=True`` makes the codec column physical: "opus" draws
    become "ulaw" clips whose payload is genuinely G.711 mu-law (WAV
    format tag 7, 1 byte/sample), and injected near-dups are mu-law
    TRANSCODES of their source — fodder for validating the suite and
    the dedup paths on a table where codec != "pcm" actually changes
    the byte format. ``real_codecs="full"`` additionally maps "mp3"
    draws to G.711 A-law (tag 6) and "aac" draws to IMA ADPCM (tag
    0x11, block-compressed ~4:1 with a fact chunk), and cycles
    near-dup transcodes through all three — a THREE-physical-codec
    mixed table ("opus"-draw frequencies unchanged, so True tables
    stay byte-identical)."""
    drift = default_drift_spec() if drift is None else drift
    rows_per_part = max(1, n_rows // n_parts)

    def gen(batches):
        for pdf in batches:
            yield _gen_rows(
                pdf["id"].to_numpy(), seed, n_parts, rows_per_part, drift,
                null_frac, dup_frac, dur_mu, dur_sigma, dur_clip, test_scale,
                neardup_frac, neardup_modes, real_codecs,
            )

    return spark.range(n_rows).mapInPandas(gen, schema=AUDIO_SCHEMA)


def transcripts_table(audio_df: DataFrame, orphan_frac: float = 0.0, seed: int = 42) -> DataFrame:
    """Companion (clip_id, transcript) side table for the referential
    clip<->transcript check; drops a deterministic ``orphan_frac`` of
    clips so the anti-join has known violations."""
    from pyspark.sql import functions as F

    df = audio_df.select("clip_id", "transcript")
    if orphan_frac > 0:
        # deterministic drop keyed on clip_id hash, not sample(): resume-stable
        cut = int(orphan_frac * 2**32) - 2**31
        df = df.filter(F.hash(F.col("clip_id"), F.lit(seed)) >= cut)
    return df


def write_audio_table(df: DataFrame, path: str) -> None:
    """Persist partitioned by ``part`` — the Iceberg-style partition
    layout (Iceberg runtime jar is absent in this environment; the
    partitioned-parquet fallback preserves identical partition pruning
    semantics, SURVEY.md §7.2)."""
    df.write.mode("overwrite").partitionBy("part").parquet(path)


EXAMPLE_SCHEMA = T.StructType(
    [T.StructField("year", T.IntegerType(), False)]
    + [T.StructField(c, T.DoubleType(), True) for c in "abcdefghij"]
    + [
        T.StructField("cat", T.IntegerType(), True),
        T.StructField("confidence", T.DoubleType(), True),
        T.StructField("drift", T.BooleanType(), False),
    ]
)


def make_example_batch_data(spark: SparkSession, year_size: int = 20000,
                            seed: int = 123, n_partitions: int = 30) -> DataFrame:
    """Spark-native analog of the reference's example batch dataset
    (/root/reference/menelaus/datasets/make_example_data.py:8-113):
    years 2007-2021 x ``year_size`` rows; gamma columns a,c,d,g,h,i,j;
    normal b,e,f; categorical ``cat`` (7 levels, fixed skewed probs);
    ``confidence`` uniform [0, 0.6]; the same five injected drifts
    (b mean shift 2009; c/d variance collapse 2012; e/f correlation
    2015; h + confidence regime change >2018; j rescale 2021) and the
    ``drift`` flag on {2009, 2012, 2015, 2018, 2021}.

    Distributed generation with a per-partition counter-based RNG over
    a FIXED internal partition count, so output is deterministic for a
    given (seed, year_size, n_partitions) — the reference draws from
    one global numpy stream, which cannot be distributed.
    """
    import pandas as pd

    years = list(range(2007, 2022))
    n = year_size * len(years)
    # approximate the global column means used by drift 2 (law of large
    # numbers: gamma(7)*1000 -> 7000, gamma(10)*10000 -> 100000)
    mu_c, mu_d = 7000.0, 100000.0

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            m = len(idx)
            if m == 0:
                continue
            rng = np.random.default_rng([seed, int(idx[0])])
            year = (2007 + idx // year_size).astype("int32")
            out = pd.DataFrame({"year": year})
            out["a"] = rng.gamma(shape=8.0, size=m) * 1000
            out["b"] = rng.normal(200.0, 10.0, m)
            out["c"] = rng.gamma(shape=7.0, size=m) * 1000
            out["d"] = rng.gamma(shape=10.0, size=m) * 10000
            ef = rng.multivariate_normal((0, 0), np.array([[2.0, 0.0], [0.0, 2.0]]), m)
            out["e"], out["f"] = ef[:, 0], ef[:, 1]
            out["g"] = rng.gamma(shape=11.0, size=m) * 10000
            out["h"] = rng.gamma(shape=12.0, size=m) * 1000
            out["i"] = rng.gamma(shape=9.0, size=m) * 1000
            out["j"] = rng.gamma(shape=10.0, size=m) * 100
            out["cat"] = rng.choice(
                np.arange(7), size=m, p=(0.3, 0.3, 0.2, 0.1, 0.05, 0.04, 0.01)
            ).astype("int32")
            out["confidence"] = rng.uniform(0.0, 0.6, m)
            # drift 1: b mean shift in 2009
            mask = year == 2009
            out.loc[mask, "b"] = rng.normal(500.0, 10.0, int(mask.sum()))
            # drift 2: c/d variance collapse in 2012
            mask = (year == 2012) & (idx % 10 == 0)
            out.loc[mask, "c"] = mu_c + rng.normal(0, 10, int(mask.sum()))
            mask = (year == 2012) & (idx % 2 == 0)
            out.loc[mask, "d"] = mu_d + rng.normal(0, 10, int(mask.sum()))
            # drift 3: e/f correlation in 2015
            mask = year == 2015
            k = int(mask.sum())
            if k:
                ef2 = rng.multivariate_normal((0, 0), np.array([[2.0, 1.0], [1.0, 2.0]]), k)
                out.loc[mask, "e"] = ef2[:, 0]
                out.loc[mask, "f"] = ef2[:, 1]
            # drift 4: h + confidence regime change after 2018
            mask = year > 2018
            k = int(mask.sum())
            if k:
                out.loc[mask, "h"] = rng.gamma(shape=1.0, scale=1.0, size=k) * 1000
                out.loc[mask, "confidence"] = rng.uniform(0.4, 1.0, k)
            # drift 5: j rescale in 2021
            mask = year == 2021
            k = int(mask.sum())
            if k:
                out.loc[mask, "j"] = rng.gamma(shape=10.0, size=k) * 10
            out["drift"] = np.isin(year, [2009, 2012, 2015, 2018, 2021])
            yield out

    return spark.range(n, numPartitions=n_partitions).mapInPandas(
        gen, schema=EXAMPLE_SCHEMA
    )
