"""ASR pipeline surface: DSP transcriber + actor-pool stage contract.

The transcriber is a real weight-free algorithm over genuine PCM WAV
bytes (RIFF walk, RMS energy segmentation, FFT pitch over a tone
vocabulary); the generator's construction plan is the independent truth.
Failure handling mirrors the reference pipeline: malformed audio becomes
a failure ROW, never an exception.
"""

import struct
from pathlib import Path

import numpy as np
import pyarrow as pa
import pytest

from docling_ray.sources.audio import (
    FREQS,
    VOCAB,
    expected_transcript,
    make_audio_table,
    make_expected_asr_table,
    _wav_bytes,
)
from docling_ray.stages.asr import (
    AsrOptions,
    AsrStage,
    ConversationItem,
    DspTranscriber,
    asr_pipeline,
    parse_wav,
)


def test_transcriber_recovers_construction():
    table, expected = make_audio_table(20, seed=42)
    out = AsrStage()(table)
    for i in range(out.num_rows):
        d = out["doc_id"][i].as_py()
        assert out["text"][i].as_py() == expected_transcript(expected[d])
        assert out["n_segments"][i].as_py() == len(expected[d])
        assert out["status"][i].as_py() == "success"


def test_conversation_item_format():
    item = ConversationItem(text="hello", start_time=0.1, end_time=0.56)
    assert item.to_string() == "[time: 0.1-0.56] hello"
    item.speaker = "speaker-0"
    assert item.to_string() == "[time: 0.1-0.56] [speaker:speaker-0] hello"
    assert ConversationItem(text="x").to_string() == "x"


def test_timestamps_option_off():
    table, _ = make_audio_table(2, seed=1)
    items = DspTranscriber(AsrOptions(timestamps=False)).transcribe(
        table["audio"][0].as_py())
    assert items and all(i.start_time is None for i in items)
    assert "[time:" not in items[0].to_string()


def test_word_timestamps():
    table, expected = make_audio_table(2, seed=1)
    items = DspTranscriber(AsrOptions()).transcribe(
        table["audio"][0].as_py())
    d = table["doc_id"][0].as_py()
    words = [w for _, _, ws in expected[d] for w in ws]
    got = [w for item in items for (w, _, _) in item.words]
    assert got == words
    # word times nest inside their utterance
    for item in items:
        for _, ws, we in item.words:
            assert item.start_time <= ws < we <= item.end_time
    off = DspTranscriber(AsrOptions(word_timestamps=False)).transcribe(
        table["audio"][0].as_py())
    assert all(i.words == [] for i in off)


def test_malformed_audio_is_failure_row():
    table, _ = make_audio_table(1, seed=3)
    good = table["audio"][0].as_py()
    bad = pa.table({
        "doc_id": ["ok", "empty", "garbage", "truncated"],
        "url": ["u"] * 4,
        "audio": pa.array([good, b"", b"not audio at all" * 4,
                           good[:50]], pa.large_binary()),
    })
    out = AsrStage()(bad)
    assert out["status"].to_pylist() == ["success", "failure", "failure",
                                         "failure"]
    assert out["text"][1].as_py() == ""
    assert out["n_segments"].to_pylist()[1:] == [0, 0, 0]


def test_parse_wav_stereo_downmix():
    mono = np.concatenate([np.zeros(1600),
                           0.6 * np.sin(2 * np.pi * 300 *
                                        np.arange(1600) / 16000)])
    stereo = np.repeat(mono, 2)
    pcm = (stereo * 32767).astype("<i2").tobytes()
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm),
                      b"WAVE", b"fmt ", 16, 1, 2, 16000, 64000, 4, 16,
                      b"data", len(pcm))
    samples, sr = parse_wav(hdr + pcm)
    assert sr == 16000 and len(samples) == len(mono)
    assert np.allclose(samples, mono, atol=1e-3)


def test_silence_only_audio():
    raw = _wav_bytes(np.zeros(16000))
    assert DspTranscriber(AsrOptions()).transcribe(raw) == []


def test_whisper_gate():
    with pytest.raises((ImportError, NotImplementedError)):
        AsrStage(AsrOptions(kind="native_whisper"))
    with pytest.raises(ValueError):
        AsrStage(AsrOptions(kind="nope"))


def test_vocab_freqs_fft_exact():
    # every vocabulary tone lands on an exact rFFT bin of a word window
    n = 1600
    assert all((f * n) % 16000 == 0 for f in FREQS)
    assert len(set(VOCAB)) == len(VOCAB) == len(FREQS)


def test_asr_pipeline_matches_golden(ray_session):
    import hashlib

    import pyarrow.parquet as pq
    import ray.data

    table, _ = make_audio_table(30, seed=42)
    df = asr_pipeline(ray.data.from_arrow(table)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    golden = pq.read_table(
        Path(__file__).parent / "data" / "golden_asr.parquet").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert df["doc_id"].tolist() == golden["doc_id"].tolist()
    assert df["n_segments"].tolist() == golden["n_segments"].tolist()
    got_md5 = [__import__("hashlib").md5(t.encode()).hexdigest()
               for t in df["text"]]
    assert got_md5 == golden["transcript_md5"].tolist()
    assert max(df["n_batches_since_load"]) >= 1
