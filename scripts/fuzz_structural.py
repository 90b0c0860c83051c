"""Structural mutation fuzz for the binary-format readers (PDF + WARC).

Deterministic (seeded) byte-level mutations — flips, deletions,
insertions — over every writer flavour, asserting the robustness
contract each reader documents:

- PDF: extract_pdf_ex raises ONLY PdfError on unusable input, and is
  deterministic (same bytes → same dict) on whatever it accepts.
- WARC: iter_warc_bytes raises only the file-level contract set
  (OSError / EOFError / zlib.error — exactly what the Spark read path
  guards at sources/warc.py), is deterministic, and never explodes into
  unbounded duplicate rows (the negative-Content-Length livelock class).

This is the harness that found the round-4 _as_int escapes (corrupt
/ObjStm N, scalar /Kids).  Run standalone; the committed pytest suites
carry smaller hypothesis variants of the same properties.

Usage: python scripts/fuzz_structural.py [trials_per_target=12000] [seed=42]
"""

from __future__ import annotations

import random
import sys
import zlib

sys.path.insert(0, "/root/repo")


def mutate(rng: random.Random, base: bytes) -> bytes:
    buf = bytearray(base)
    for _ in range(rng.randint(1, 6)):
        op = rng.random()
        if op < 0.5 and buf:
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        elif op < 0.8 and buf:
            i = rng.randrange(len(buf))
            del buf[i : i + rng.randint(1, 60)]
        else:
            i = rng.randrange(len(buf) + 1)
            buf[i:i] = bytes(rng.randrange(256) for _ in range(rng.randint(1, 25)))
    return bytes(buf)


def fuzz_pdf(trials: int, seed: int) -> int:
    from rust_html2text_spark.engine.pdfparse import PdfError
    from rust_html2text_spark.engine.pdftext import extract_pdf_ex
    from rust_html2text_spark.sources.pdfcorpus import build_pdf

    rng = random.Random(seed)
    bases = [
        build_pdf(i, " ".join(f"w{j}," for j in range(150)), f"s{i}")
        # both xref flavours × compression, plus every encrypted lane:
        # RC4-128/R3 (4), AES-128/R4 (7), AES-256/R6 (11), RC4-40/R2
        # (16), AES-256/R5 (29) — mutating /Encrypt shapes is exactly
        # where hostile-crypto escapes live
        for i in (0, 1, 2, 3, 4, 7, 11, 16, 29)
    ]
    crashes = 0
    for trial in range(trials):
        data = mutate(rng, rng.choice(bases))
        try:
            a = extract_pdf_ex(data)
            b = extract_pdf_ex(data)
            assert a == b, f"pdf nondeterminism at trial {trial}"
        except PdfError:
            pass
        except Exception as e:
            crashes += 1
            print(f"PDF CRASH trial {trial}: {type(e).__name__}: {e}")
    return crashes


def fuzz_warc(trials: int, seed: int) -> int:
    import os
    import tempfile
    from datetime import datetime

    from rust_html2text_spark.sources.warc import iter_warc_bytes, write_warc_file

    recs = [
        (f"https://e.x/{i}", datetime(2026, 1, 1), b"<p>body %d</p>" % i)
        for i in range(5)
    ]
    bases = []
    for enc in (None, "gzip", "chunked", "gzip+chunked"):
        for gz in (True, False):
            path = tempfile.mktemp()
            write_warc_file(path, recs, gzip_members=gz, http_encoding=enc)
            with open(path, "rb") as fh:
                bases.append(fh.read())
            os.unlink(path)

    rng = random.Random(seed)
    crashes = 0
    for trial in range(trials):
        data = mutate(rng, rng.choice(bases))
        try:
            a = list(iter_warc_bytes(data))
            b = list(iter_warc_bytes(data))
            assert a == b, f"warc nondeterminism at trial {trial}"
            assert len(a) < 1000, f"warc row explosion at trial {trial}"
        except (OSError, EOFError, zlib.error):
            pass  # the operator-level guard catches exactly these
        except Exception as e:
            crashes += 1
            print(f"WARC CRASH trial {trial}: {type(e).__name__}: {e}")
    return crashes


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    pdf_crashes = fuzz_pdf(trials, seed)
    warc_crashes = fuzz_warc(trials, seed)
    print(
        f"{trials} trials per target: pdf_crashes={pdf_crashes} "
        f"warc_crashes={warc_crashes}"
    )
    sys.exit(1 if pdf_crashes or warc_crashes else 0)


if __name__ == "__main__":
    main()
