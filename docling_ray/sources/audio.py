"""Deterministic synthetic speech-audio fixtures for the ASR pipeline.

Real RIFF/WAVE PCM16 mono files built sample-by-sample with numpy: each
"spoken word" is a pure tone whose frequency indexes a small vocabulary,
words inside an utterance are separated by short gaps, utterances by long
silences.  Everything is aligned to the 10 ms analysis frame
(``FRAME = 160`` samples at 16 kHz) so the DSP transcriber's
energy-segmentation recovers the construction exactly, and the generator
can emit the expected transcript independently of any stage code (the
TRUE-golden pattern of ``sources/pdf_pages.py``).
"""

from __future__ import annotations

import random
import struct

import numpy as np
import pyarrow as pa

SAMPLE_RATE = 16_000
FRAME = 160                      # 10 ms analysis frame
WORD_FRAMES = 10                 # 100 ms per word tone
GAP_FRAMES = 2                   # 20 ms intra-utterance gap
SILENCE_FRAMES = 30              # 300 ms between utterances
LEAD_FRAMES = 10                 # 100 ms leading silence
AMPLITUDE = 0.6

# tone vocabulary: 10 Hz-aligned so a 1600-sample rFFT bin is exact
VOCAB = ("alpha bravo charlie delta echo foxtrot golf hotel india "
         "juliet kilo lima").split()
FREQS = [300 + 120 * k for k in range(len(VOCAB))]

SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("url", pa.string()),
    ("audio", pa.large_binary()),
])


def _wav_bytes(samples: np.ndarray) -> bytes:
    """Minimal canonical RIFF/WAVE container around PCM16 mono data."""
    pcm = (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16, 1, 1, SAMPLE_RATE, SAMPLE_RATE * 2, 2, 16,
        b"data", len(pcm))
    return hdr + pcm


def _tone(freq: float, n_samples: int) -> np.ndarray:
    t = np.arange(n_samples, dtype=np.float64) / SAMPLE_RATE
    return AMPLITUDE * np.sin(2.0 * np.pi * freq * t)


def make_audio_table(n_docs: int, seed: int = 42,
                     max_utterances: int = 4):
    """Build the audio table plus the generator's own expected
    transcription: ``{doc_id: [(start_frame, end_frame, words), ...]}``."""
    rows = {"doc_id": [], "url": [], "audio": []}
    expected: dict[str, list] = {}
    for d in range(n_docs):
        rng = random.Random((seed << 20) ^ d)
        doc_id = f"audio-{seed}-{d:05d}"
        chunks = [np.zeros(LEAD_FRAMES * FRAME)]
        frame = LEAD_FRAMES
        utterances = []
        for _ in range(rng.randint(1, max_utterances)):
            words = [rng.choice(VOCAB)
                     for _ in range(rng.randint(2, 5))]
            start = frame
            for w_i, word in enumerate(words):
                if w_i:
                    chunks.append(np.zeros(GAP_FRAMES * FRAME))
                    frame += GAP_FRAMES
                chunks.append(_tone(FREQS[VOCAB.index(word)],
                                    WORD_FRAMES * FRAME))
                frame += WORD_FRAMES
            utterances.append((start, frame, words))
            chunks.append(np.zeros(SILENCE_FRAMES * FRAME))
            frame += SILENCE_FRAMES
        expected[doc_id] = utterances
        rows["doc_id"].append(doc_id)
        rows["url"].append(f"https://synthetic-audio.example.org/{doc_id}.wav")
        rows["audio"].append(_wav_bytes(np.concatenate(chunks)))
    return pa.table(rows, schema=SCHEMA), expected


def expected_transcript(utterances: list) -> str:
    """The generator's simulation of the pipeline's document text: one
    ``[time: s-e] words`` line per utterance (the reference
    ``_ConversationItem.to_string`` shape, asr_pipeline.py:85-95)."""
    lines = []
    for start_frame, end_frame, words in utterances:
        start = round(start_frame * 0.01, 2)
        end = round(end_frame * 0.01, 2)
        lines.append(f"[time: {start}-{end}] " + " ".join(words))
    return "\n".join(lines)


def make_expected_asr_table(n_docs: int, seed: int = 42) -> pa.Table:
    """TRUE golden: (doc_id, n_segments, transcript_md5) simulated from
    the construction plan; no stage code runs here."""
    import hashlib

    _, expected = make_audio_table(n_docs, seed=seed)
    ids = sorted(expected)
    return pa.table({
        "doc_id": pa.array(ids, pa.string()),
        "n_segments": pa.array([len(expected[d]) for d in ids], pa.int64()),
        "transcript_md5": pa.array(
            [hashlib.md5(expected_transcript(expected[d]).encode())
             .hexdigest() for d in ids], pa.string()),
    })
