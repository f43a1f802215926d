#!/usr/bin/env python3
"""Generate the committed BMP test fixtures (deterministic, no image libs).

8x8, 24bpp, BI_RGB, bottom-up, width 8 => 24-byte rows, no padding.
Run once; outputs are committed under src/test/resources/img/.
"""
import os
import struct


def bmp(width, height, pixel):  # pixel(x, y) -> (b, g, r)
    stride = ((width * 3 + 3) // 4) * 4
    img_size = stride * height
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       img_size, 2835, 2835, 0, 0)
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            b, g, r = pixel(x, y)
            row += bytes((b, g, r))
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    return header + info + b"".join(rows)


out = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "img")
os.makedirs(out, exist_ok=True)
fixtures = {
    "solid.bmp": lambda x, y: (10, 20, 30),
    "gradient.bmp": lambda x, y: (x * 8, y * 8, (x + y) * 4),
    "stripes.bmp": lambda x, y: (255, 0, 0) if y % 2 == 0 else (0, 255, 128),
}
for name, px in fixtures.items():
    data = bmp(8, 8, px)
    with open(os.path.join(out, name), "wb") as f:
        f.write(data)
    print(name, len(data), "bytes, pixel_sum =",
          sum(data[54:]))
