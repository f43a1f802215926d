#!/usr/bin/env python3
"""Deterministic canonical RIFF/WAVE PCM-16 fixtures for the audio-decode
gate (q134) and WavCodecSpec. Standard 44-byte header + data chunk; one
fixture carries an extra LIST chunk between fmt and data so the codec's
chunk walk (not fixed offsets) is exercised. Sample values sweep the
signed range including both extremes."""
import os, struct

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "audio")
os.makedirs(OUT, exist_ok=True)


def wav_bytes(sample_rate, channels, samples, extra_chunk=None):
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * channels * 2, channels * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:
        pad = b"\x00" if len(extra_chunk) % 2 else b""
        chunks += b"LIST" + struct.pack("<I", len(extra_chunk)) + extra_chunk + pad
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def samples(n, seed):
    out = []
    v = seed
    for i in range(n):
        v = (v * 1103515245 + 12345) % (1 << 31)
        out.append((v % 65536) - 32768)
    # pin both signed extremes so signedness bugs are loud
    out[0] = -32768
    out[1] = 32767
    return out


fixtures = {
    # canonical 44-byte header, mono
    "tone_mono_8k.wav": wav_bytes(8000, 1, samples(2000, 7)),
    # stereo, different rate
    "noise_stereo_16k.wav": wav_bytes(16000, 2, samples(3000, 42)),
    # extra LIST chunk between fmt and data: chunk walk required
    "tagged_mono_44k.wav": wav_bytes(44100, 1, samples(1500, 99),
                                     extra_chunk=b"INFOIART" + struct.pack("<I", 5) + b"graft"),
}

for name, payload in fixtures.items():
    with open(os.path.join(OUT, name), "wb") as f:
        f.write(payload)
    print(name, len(payload), "bytes")
