"""Ray Data ASR pipeline — the reference ``AsrPipeline``
(``/root/reference/docling/pipeline/asr_pipeline.py:98-253``) re-expressed
Ray-first.

Shape::

    audio table (doc_id, url, audio: binary)
        → map_batches(AsrStage, concurrency=N)      # actor pool
        → (doc_id, url, text, n_segments, status)

The stage is the reference's ``_NativeWhisperModel`` slot: the transcriber
loads ONCE per actor in ``__init__``, ``__call__`` transcribes each row's
audio bytes and builds the document text as one conversation line per
segment (``_ConversationItem.to_string``, asr_pipeline.py:85-95 —
``[time: start-end] [speaker:name] text``).  Failures are DATA: malformed
audio yields ``status='failure'`` with empty text, never an exception
(the reference's run() try/except, asr_pipeline.py:149-177).

Whisper weights don't ship in this runtime, so the shipped tier is a real
DSP transcriber over genuine PCM WAV bytes: RIFF chunk walk, 10 ms RMS
energy frames, silence-gap segmentation into utterances and words, and an
exact-bin FFT pitch estimate mapped onto a tone vocabulary
(``sources/audio.py``).  It is a deterministic, weight-free *algorithm* —
not a metadata passthrough — so the actor contract, batch shapes, error
handling and timestamp formatting are all exercised for real; a whisper
drop-in replaces only ``transcribe``.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa


@dataclass
class ConversationItem:
    """``_ConversationItem`` analog (asr_pipeline.py:59-95)."""

    text: str
    start_time: Optional[float] = None
    end_time: Optional[float] = None
    speaker_id: Optional[int] = None
    speaker: Optional[str] = None
    words: list = field(default_factory=list)   # (text, start, end)

    def to_string(self) -> str:
        result = ""
        if self.start_time is not None and self.end_time is not None:
            result += f"[time: {self.start_time}-{self.end_time}] "
        if self.speaker is not None:
            result += f"[speaker:{self.speaker}] "
        return result + self.text


@dataclass
class AsrOptions:
    """``InlineAsrNativeWhisperOptions`` surface (the fields this engine
    acts on; device selection is an actor-pool sizing concern here)."""

    kind: str = "dsp"            # dsp | native_whisper
    repo_id: str = "tiny"
    language: str = "en"
    verbose: bool = False
    timestamps: bool = True
    word_timestamps: bool = True
    temperature: float = 0.0
    max_new_tokens: int = 256
    max_time_chunk: float = 30.0

    @property
    def repo_cache_folder(self) -> str:
        return self.repo_id.replace("/", "--")


def parse_wav(raw: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 walk → (float samples in [-1, 1], sample_rate).

    Raises ValueError on anything malformed — the stage maps that to a
    failure ROW, not a crash.
    """
    if len(raw) < 44 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, sr, n_channels, bits = 12, None, None, None
    data = None
    while pos + 8 <= len(raw):
        cid = raw[pos:pos + 4]
        size = struct.unpack_from("<I", raw, pos + 4)[0]
        body = raw[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt, n_channels, sr = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1 or bits != 16:
                raise ValueError(f"unsupported format {fmt}/{bits}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if sr is None or data is None or not n_channels:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32767.0
    if n_channels > 1:
        samples = samples[:len(samples) - len(samples) % n_channels]
        samples = samples.reshape(-1, n_channels).mean(axis=1)
    return samples, sr


class DspTranscriber:
    """Energy-segmentation + FFT pitch lookup over a tone vocabulary.

    Segmentation: RMS per 10 ms frame → voiced mask; voiced runs whose
    gaps are below ``min_silence_frames`` merge into one utterance, longer
    gaps split utterances.  Word units are the voiced runs inside an
    utterance; each word's pitch is the rFFT argmax over its samples,
    snapped to the nearest vocabulary tone.
    """

    def __init__(self, options: AsrOptions):
        from docling_ray.sources.audio import FREQS, VOCAB

        self.options = options
        self.freqs = np.asarray(FREQS, dtype=np.float64)
        self.vocab = list(VOCAB)
        self.frame = 160
        self.rms_threshold = 0.05
        self.min_silence_frames = 25    # 250 ms splits utterances

    def _word_of(self, samples: np.ndarray, sr: int) -> str:
        spectrum = np.abs(np.fft.rfft(samples))
        spectrum[0] = 0.0               # ignore DC
        freq = np.argmax(spectrum) * sr / len(samples)
        return self.vocab[int(np.argmin(np.abs(self.freqs - freq)))]

    def transcribe(self, raw: bytes) -> list[ConversationItem]:
        samples, sr = parse_wav(raw)
        frame = self.frame
        n_frames = len(samples) // frame
        if n_frames == 0:
            return []
        framed = samples[:n_frames * frame].reshape(n_frames, frame)
        rms = np.sqrt((framed * framed).mean(axis=1))
        voiced = rms > self.rms_threshold
        idx = np.flatnonzero(voiced)
        if idx.size == 0:
            return []
        # voiced runs: (start_frame, end_frame_exclusive)
        breaks = np.flatnonzero(np.diff(idx) > 1)
        run_starts = np.concatenate(([idx[0]], idx[breaks + 1]))
        run_ends = np.concatenate((idx[breaks] + 1, [idx[-1] + 1]))
        items: list[ConversationItem] = []
        current: list[tuple[int, int]] = []

        def flush():
            if not current:
                return
            words = []
            for ws, we in current:
                text = self._word_of(
                    samples[ws * frame:we * frame], sr)
                words.append((text, round(ws * 0.01, 2),
                              round(we * 0.01, 2)))
            item = ConversationItem(
                text=" ".join(w for w, _, _ in words),
                start_time=round(current[0][0] * 0.01, 2),
                end_time=round(current[-1][1] * 0.01, 2),
                words=words if self.options.word_timestamps else [])
            if not self.options.timestamps:
                item.start_time = item.end_time = None
            items.append(item)

        for rs, re_ in zip(run_starts, run_ends):
            if current and rs - current[-1][1] >= self.min_silence_frames:
                flush()
                current = []
            current.append((int(rs), int(re_)))
        flush()
        return items


def _resolve_transcriber(options: AsrOptions):
    if options.kind == "dsp":
        return DspTranscriber(options)
    if options.kind == "native_whisper":
        try:
            import whisper  # noqa: F401  (absent in this runtime)
        except ImportError:
            raise ImportError(
                "whisper is not installed. Please install it via "
                "`pip install openai-whisper`.")   # reference :117-120
        raise NotImplementedError("native whisper tier needs model weights")
    raise ValueError(f"unknown ASR kind {options.kind!r}")


class AsrStage:
    """Actor-pool transcription stage; emits ``n_batches_since_load`` so
    actor reuse is provable (the ``LayoutLearnedStage`` contract)."""

    def __init__(self, options: AsrOptions | None = None):
        self.options = options or AsrOptions()
        self.model = _resolve_transcriber(self.options)  # once per ACTOR
        self.n_batches_since_load = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.n_batches_since_load += 1
        texts, counts, status = [], [], []
        for raw in batch["audio"]:
            try:
                items = self.model.transcribe(raw.as_py() or b"")
                texts.append("\n".join(i.to_string() for i in items))
                counts.append(len(items))
                status.append("success")
            except Exception:
                texts.append("")
                counts.append(0)
                status.append("failure")
        out = batch.drop_columns(["audio"])   # payload consumed here
        out = out.append_column("text", pa.array(texts, pa.large_string()))
        out = out.append_column("n_segments", pa.array(counts, pa.int64()))
        out = out.append_column("status", pa.array(status, pa.string()))
        return out.append_column(
            "n_batches_since_load",
            pa.array([self.n_batches_since_load] * out.num_rows,
                     pa.int64()))


def asr_pipeline(ds, options: AsrOptions | None = None,
                 concurrency: int = 4, batch_size: int = 16):
    """Audio dataset → transcribed documents.  Small batches: rows carry
    whole audio payloads (the multimodal batch-sizing rule)."""
    return ds.map_batches(
        AsrStage, batch_format="pyarrow",
        batch_size=batch_size, concurrency=(1, concurrency),
        fn_constructor_kwargs={"options": options or AsrOptions()})
