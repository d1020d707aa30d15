"""Native C++ EXR decoder vs. a pure-python reference writer/reader."""
import struct
import zlib

import numpy as np
import pytest

from niceslam_tpu.io import native_loader


def write_exr(path, img: np.ndarray, channel: str = "Z", compress: bool = False):
    """Minimal single-channel FLOAT scanline EXR writer (test fixture)."""
    h, w = img.shape
    img = img.astype("<f4")

    def attr(name, typ, data):
        return name.encode() + b"\0" + typ.encode() + b"\0" + struct.pack("<i", len(data)) + data

    chlist = (
        channel.encode() + b"\0" + struct.pack("<i", 2)  # FLOAT
        + struct.pack("<i", 0)  # pLinear + reserved
        + struct.pack("<ii", 1, 1)  # sampling
    ) + b"\0"
    header = b""
    header += attr("channels", "chlist", chlist)
    header += attr("compression", "compression", bytes([3 if compress else 0]))
    header += attr("dataWindow", "box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
    header += attr("displayWindow", "box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
    header += attr("lineOrder", "lineOrder", bytes([0]))
    header += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
    header += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\0"

    lines_per_block = 16 if compress else 1
    blocks = []
    for y0 in range(0, h, lines_per_block):
        y1 = min(y0 + lines_per_block, h)
        raw = img[y0:y1].tobytes()
        if compress:
            b = bytearray(raw)
            # EXR ZIP pre-filter: interleave split + delta (inverse of
            # reconstruction in the decoder)
            half = (len(b) + 1) // 2
            inter = bytearray(len(b))
            inter[:half] = b[0::2]
            inter[half:] = b[1::2]
            d = bytearray(inter)
            for i in range(len(d) - 1, 0, -1):
                d[i] = (d[i] - d[i - 1] + 128) & 0xFF
            packed = zlib.compress(bytes(d))
            if len(packed) >= len(raw):
                packed = raw
            blocks.append((y0, packed))
        else:
            blocks.append((y0, raw))

    magic = struct.pack("<I", 20000630) + struct.pack("<I", 2)
    pre = magic + header
    table_pos = len(pre)
    data_pos = table_pos + 8 * len(blocks)
    offsets = []
    cursor = data_pos
    payloads = []
    for y0, data in blocks:
        offsets.append(cursor)
        payload = struct.pack("<ii", y0, len(data)) + data
        payloads.append(payload)
        cursor += len(payload)
    with open(path, "wb") as f:
        f.write(pre)
        for o in offsets:
            f.write(struct.pack("<Q", o))
        for p in payloads:
            f.write(p)


@pytest.mark.skipif(not native_loader.available(), reason="no native lib")
@pytest.mark.parametrize("compress", [False, True])
def test_exr_round_trip(tmp_path, rng, compress):
    img = rng.uniform(0, 10, size=(37, 53)).astype(np.float32)
    p = str(tmp_path / "d.exr")
    write_exr(p, img, compress=compress)
    out = native_loader.read_exr(p)
    np.testing.assert_allclose(out, img, atol=0)


@pytest.mark.skipif(not native_loader.available(), reason="no native lib")
def test_exr_channel_select(tmp_path, rng):
    img = rng.uniform(size=(8, 8)).astype(np.float32)
    p = str(tmp_path / "z.exr")
    write_exr(p, img, channel="Z")
    np.testing.assert_allclose(native_loader.read_exr(p, "Z"), img)
    with pytest.raises(IOError):
        native_loader.read_exr(p, "Q")


@pytest.mark.skipif(not native_loader.available(), reason="no native lib")
def test_decode_pool(tmp_path, rng):
    imgs = [rng.uniform(size=(16, 24)).astype(np.float32) for _ in range(8)]
    paths = []
    for i, im in enumerate(imgs):
        p = str(tmp_path / f"f{i}.exr")
        write_exr(p, im, compress=(i % 2 == 0))
        paths.append(p)
    pool = native_loader.NativeDecodePool(n_workers=3)
    tickets = [pool.submit(p, (16, 24)) for p in paths]
    for t, im in zip(tickets, imgs):
        np.testing.assert_allclose(pool.wait(t), im)
    pool.close()
