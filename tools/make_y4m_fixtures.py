#!/usr/bin/env python3
"""Deterministic YUV4MPEG2 (.y4m) fixtures for Y4mCodecSpec: standard
stream header + FRAME markers + raw 4:2:0 planes. One fixture carries
header X-params and per-frame FRAME params so the parser walks marker
LINES, not fixed offsets. Luma planes are LCG-generated so the spec can
recompute sums/extrema independently from the same bytes."""
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "video")
os.makedirs(OUT, exist_ok=True)


def lcg_bytes(n, seed):
    out = bytearray()
    v = seed
    for _ in range(n):
        v = (v * 1103515245 + 12345) % (1 << 31)
        out.append(v % 256)
    return bytes(out)


def y4m(path, w, h, fps, frames, header_extra="", frame_params=None):
    luma = w * h
    chroma = (w // 2) * (h // 2)
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F{fps} Ip A1:1{header_extra}\n".encode())
        for i in range(frames):
            params = (frame_params or "")
            f.write(f"FRAME{params}\n".encode())
            f.write(lcg_bytes(luma, seed=1000 * i + w))       # Y plane
            f.write(lcg_bytes(chroma, seed=2000 * i + h))     # U plane
            f.write(lcg_bytes(chroma, seed=3000 * i + w + h)) # V plane


y4m(os.path.join(OUT, "clip_8x6_3f.y4m"), 8, 6, "25:1", 3)
y4m(os.path.join(OUT, "clip_4x4_5f_tagged.y4m"), 4, 4, "30000:1001", 5,
    header_extra=" C420jpeg XYSCSS=420JPEG", frame_params=" Xtimecode=0")
print("wrote fixtures to", OUT)
