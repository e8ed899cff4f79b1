"""Regenerate datasketches_spark/sketches/_cpc_tables.py.

Extracts the Apache DataSketches CPC entropy-coding tables from the
datasketches-java jar that ships inside pyspark (the same library the
per-family wire tests already use as a live oracle).  The tables are
static public-domain data from the Apache-2.0 project — 22 length-
limited Huffman tables for window bytes, the 65-symbol length-limited
unary code for column deltas, and the 16 column permutations used by
the SLIDING flavor — extracted once and committed so the runtime has
no JVM dependency.

Run: python scripts/gen_cpc_tables.py   (rewrites the module in place)
"""

from __future__ import annotations

import base64
import io
import zlib

import numpy as np

OUT = "datasketches_spark/sketches/_cpc_tables.py"


def extract():
    from pyspark.java_gateway import launch_gateway

    gw = launch_gateway()
    jvm = gw.jvm
    cl = jvm.java.lang.Class.forName("org.apache.datasketches.cpc.CompressionData")

    def get(name):
        f = cl.getDeclaredField(name)
        f.setAccessible(True)
        return f.get(None)

    enc = get("encodingTablesForHighEntropyByte")
    dec = get("decodingTablesForHighEntropyByte")
    llu_e = get("lengthLimitedUnaryEncodingTable65")
    llu_d = get("lengthLimitedUnaryDecodingTable65")
    perm_e = get("columnPermutationsForEncoding")
    perm_d = get("columnPermutationsForDecoding")
    return {
        "ENC_BYTE": np.array(
            [[enc[t][i] & 0xFFFF for i in range(256)] for t in range(len(enc))],
            dtype=np.uint16,
        ),
        "DEC_BYTE": np.array(
            [[dec[t][i] & 0xFFFF for i in range(4096)] for t in range(len(dec))],
            dtype=np.uint16,
        ),
        "ENC_UNARY65": np.array(
            [llu_e[i] & 0xFFFF for i in range(len(llu_e))], dtype=np.uint16
        ),
        "DEC_UNARY65": np.array(
            [llu_d[i] & 0xFFFF for i in range(len(llu_d))], dtype=np.uint16
        ),
        "PERM_ENC": np.array(
            [[perm_e[t][i] & 0xFF for i in range(56)] for t in range(len(perm_e))],
            dtype=np.uint8,
        ),
        "PERM_DEC": np.array(
            [[perm_d[t][i] & 0xFF for i in range(56)] for t in range(len(perm_d))],
            dtype=np.uint8,
        ),
    }


def emit(tables):
    lines = [
        '"""Apache DataSketches CPC entropy-coding tables (generated).',
        "",
        "Static data extracted from the Apache-2.0 datasketches-java jar",
        "bundled with pyspark by scripts/gen_cpc_tables.py — do not edit.",
        "Encoding shorts: (bitLength << 12) | code.  Decoding shorts",
        "(4096-entry, indexed by the next 12 stream bits):",
        "(bitLength << 8) | symbol.",
        '"""',
        "",
        "import base64",
        "import zlib",
        "",
        "import numpy as np",
        "",
        "",
        "def _load(b85, dtype, shape):",
        "    raw = zlib.decompress(base64.b85decode(b85))",
        "    return np.frombuffer(raw, dtype=dtype).reshape(shape).copy()",
        "",
    ]
    for name, arr in tables.items():
        data = base64.b85encode(zlib.compress(arr.tobytes(), 9)).decode()
        chunks = [data[i : i + 76] for i in range(0, len(data), 76)]
        blob = "\n".join(f'    "{c}"' for c in chunks)
        dt = str(arr.dtype)
        lines.append(f"{name} = _load(")
        lines.append(blob)
        lines.append(f'    , "{dt}", {arr.shape})')
        lines.append("")
    return "\n".join(lines) + "\n"


if __name__ == "__main__":
    tables = extract()
    for k, v in tables.items():
        print(k, v.shape, v.dtype)
    with open(OUT, "w") as f:
        f.write(emit(tables))
    print("wrote", OUT)
