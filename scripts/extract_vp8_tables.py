#!/usr/bin/env python
"""Extract the VP8 default probability/quantizer tables from a system
libwebp shared object into ``ocrs_spark/vp8_tables.py``.

Why extraction: the VP8 bitstream (RFC 6386, the public spec WebP lossy
frames use) defines ~3 KB of normative constant tables — default
coefficient probabilities (4x8x3x11), coefficient-update probabilities
(4x8x3x11), keyframe intra-bmode probabilities (10x10x9) and the two
quantizer lookup tables (128 each).  Transcribing thousands of magic
numbers by hand is error-prone, and any single wrong byte silently
desynchronizes the boolean decoder.  The system's libwebp (a reference
implementation of the same public spec) carries these exact tables in
its read-only data section, so this script locates them structurally
(unique content probes + monotonicity scans), cross-checks the two
copies the binary contains (decoder + encoder), and emits them as
Python literals.  The generated module is committed; this script is
provenance + regeneration tooling, not a runtime dependency.

Table locations are found by content probes (first rows of each table
as published in RFC 6386 sections 13.4/13.5 and the WebP format docs),
NOT by hardcoded offsets, so the script works across libwebp builds
that keep the tables byte-identical (they are normative constants).
"""

from __future__ import annotations

import ctypes.util
import struct
import sys

NUM_TYPES, NUM_BANDS, NUM_CTX, NUM_PROBAS = 4, 8, 3, 11
COEFF_TABLE_LEN = NUM_TYPES * NUM_BANDS * NUM_CTX * NUM_PROBAS  # 1056
BMODES_LEN = 10 * 10 * 9  # 900

# First coded rows, as published in RFC 6386 §13.5 (default_coeff_probs
# type 0 band 1 — band 0 of type 0 is never coded and is stored as
# all-128 filler) and §13.4 (kf_bmode_prob[0][0]).
COEFFS_PROBE = bytes([253, 136, 254, 255, 228, 219])
BMODES_PROBE = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
BANDS_PROBE = bytes([0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7])


def rodata(path: str) -> bytes:
    data = open(path, "rb").read()
    if data[:4] != b"\x7fELF" or data[4] != 2:
        raise ValueError(f"{path}: not a 64-bit ELF")
    e_shoff = struct.unpack_from("<Q", data, 0x28)[0]
    e_shentsize = struct.unpack_from("<H", data, 0x3A)[0]
    e_shnum = struct.unpack_from("<H", data, 0x3C)[0]
    e_shstrndx = struct.unpack_from("<H", data, 0x3E)[0]
    sections = []
    for i in range(e_shnum):
        off = e_shoff + i * e_shentsize
        name, _typ, _flags, _addr, offset, size = struct.unpack_from(
            "<IIQQQQ", data, off
        )
        sections.append((name, offset, size))
    strtab_off = sections[e_shstrndx][1]
    for name, offset, size in sections:
        end = data.index(b"\0", strtab_off + name)
        if data[strtab_off + name : end] == b".rodata":
            return data[offset : offset + size]
    raise ValueError(f"{path}: no .rodata section")


def find_all(hay: bytes, needle: bytes) -> list[int]:
    out, i = [], hay.find(needle)
    while i >= 0:
        out.append(i)
        i = hay.find(needle, i + 1)
    return out


def cross_checked(ro: bytes, starts: list[int], length: int, what: str) -> bytes:
    """The binary carries (at least) two copies of each table (decoder
    and encoder compilation units); all located copies must agree."""
    if not starts:
        raise ValueError(f"{what}: no copy found")
    blocks = {ro[s : s + length] for s in starts}
    if len(blocks) != 1:
        raise ValueError(f"{what}: copies at {starts} disagree")
    block = blocks.pop()
    if len(block) != length:
        raise ValueError(f"{what}: truncated at end of .rodata")
    return block


def extract(path: str) -> dict:
    ro = rodata(path)

    # CoeffsProba0: probe matches type0/band1/ctx0; the table starts one
    # all-128 band block (NUM_CTX*NUM_PROBAS bytes) earlier.
    lead = NUM_CTX * NUM_PROBAS
    starts = [p - lead for p in find_all(ro, COEFFS_PROBE)]
    for s in starts:
        if ro[s : s + lead] != bytes([128]) * lead:
            raise ValueError("CoeffsProba0: leading filler block mismatch")
    coeffs = cross_checked(ro, starts, COEFF_TABLE_LEN, "CoeffsProba0")

    bmodes = cross_checked(
        ro, find_all(ro, BMODES_PROBE), BMODES_LEN, "kBModesProba"
    )

    # CoeffsUpdateProba directly precedes kBModesProba in both copies
    # (verified identical); locate it relative to each bmodes copy.
    upd_starts = [s - COEFF_TABLE_LEN for s in find_all(ro, BMODES_PROBE)]
    update = cross_checked(ro, upd_starts, COEFF_TABLE_LEN, "CoeffsUpdateProba")
    if update.count(255) < 800:
        raise ValueError("CoeffsUpdateProba: implausible content")

    # Quantizer lookups: 128-entry monotone tables, DC as uint8 starting
    # 4,5,6,7,8,9,10,10 and ending 157; AC as uint16 starting 4,5 and
    # ending 284 (RFC 6386 §14.1).
    dc_starts = []
    probe = bytes([4, 5, 6, 7, 8, 9, 10, 10])
    for i in find_all(ro, probe):
        w = ro[i : i + 128]
        if len(w) == 128 and all(w[j + 1] >= w[j] for j in range(127)) and w[-1] == 157:
            dc_starts.append(i)
    dc = cross_checked(ro, dc_starts, 128, "kDcTable")

    ac_starts = []
    for i in range(0, len(ro) - 256, 2):
        vals = struct.unpack_from("<128H", ro, i)
        if (
            vals[:2] == (4, 5)
            and vals[-1] == 284
            and all(vals[j + 1] >= vals[j] for j in range(127))
        ):
            ac_starts.append(i)
    ac_raw = cross_checked(ro, ac_starts, 256, "kAcTable")
    ac = list(struct.unpack("<128H", ac_raw))

    if BANDS_PROBE not in ro:
        raise ValueError("coeff_bands table not found (sanity probe)")

    def nest(flat, dims):
        if not dims:
            return flat
        n = len(flat) // dims[0]
        return [nest(flat[i * n : (i + 1) * n], dims[1:]) for i in range(dims[0])]

    return {
        "COEFF_PROBS": nest(list(coeffs), [NUM_TYPES, NUM_BANDS, NUM_CTX]),
        "COEFF_UPDATE_PROBS": nest(list(update), [NUM_TYPES, NUM_BANDS, NUM_CTX]),
        "KF_BMODE_PROBS": nest(list(bmodes), [10, 10]),
        "DC_QLOOKUP": list(dc),
        "AC_QLOOKUP": ac,
    }


def main() -> None:
    import os

    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        # find_library returns a soname, not a path; search the usual
        # loader directories for the actual file.
        name = ctypes.util.find_library("webp") or "libwebp.so.7"
        for d in ("/usr/lib/x86_64-linux-gnu", "/usr/lib", "/usr/local/lib", "/lib"):
            cand = os.path.join(d, name)
            if os.path.exists(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(f"cannot locate {name} on this system")

    real = os.path.realpath(path)
    tables = extract(real)
    out = [
        '"""VP8 normative constant tables (RFC 6386 §13.4/§13.5/§14.1).',
        "",
        "GENERATED by scripts/extract_vp8_tables.py from the system libwebp",
        f"(source binary: {os.path.basename(real)}), which embeds these",
        "public-spec constants verbatim; both embedded copies (decoder and",
        "encoder compilation units) were cross-checked byte-identical.",
        "Regenerate with:  python scripts/extract_vp8_tables.py",
        '"""',
        "",
        "# fmt: off",
    ]
    for name, val in tables.items():
        out.append(f"{name} = {val!r}")
    out.append("# fmt: on")
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ocrs_spark",
        "vp8_tables.py",
    )
    with open(dest, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
