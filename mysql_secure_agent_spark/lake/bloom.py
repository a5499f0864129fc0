"""Per-file key bloom filters: listing-level pruning for point lookups.

Delta files from micro-batch merges are exactly the files range stats
cannot prune: they land in ARRIVAL order, so each one's key min/max spans
nearly the whole key domain and ``key_stats`` intersection keeps every
delta a bucket holds. A point lookup on a hot table with many
not-yet-compacted deltas therefore opens them all — the pattern Hudi's
bloom index exists for (public design: per-file bloom filters consulted
before any data read). Here the bloom lives in the MANIFEST entry, so the
lookup consults it during listing — zero file opens for pruned files, not
even a footer.

Sizing discipline (why Iceberg keeps blooms OUT of manifests): a bloom
sized for a bulk file would bloat driver-side metadata, so blooms are
recorded ONLY for files at or below ``KEY_BLOOM_MAX_ROWS`` rows —
micro-batch CDC deltas, the seconds-cadence commits a 10^10-event stream
produces. Bigger files are either base files (key-sorted by compaction,
where min/max range stats prune BETTER than a bloom could) or bulk
backfill deltas headed for compaction anyway. At the cap (4096 keys in
2^15 bits, k=4) the false-positive rate is ~2.4%; at a typical 500-row
micro-batch it is ~1e-5. Stored zlib-compressed + base64: a sparse bloom
compresses to a few hundred bytes.

Hash plumbing: h1 is ``spark_hash_typed`` over the bucket-key tuple — the
SAME Murmur3 chain Spark's ``F.hash`` computes, already proven against the
engine's bucket math (``lake.bucketing``); probe positions derive from
(h1, h2) double hashing (Kirsch–Mitzenmacher), h2 = one more Murmur3 round
over h1. No new hash family, no drift risk against the write side.
"""

from __future__ import annotations

import base64
import zlib

from .bucketing import hash_int, spark_hash_typed

KEY_BLOOM_BITS = 1 << 15   # 4 KiB of bits per filter
KEY_BLOOM_K = 4            # probes per key
KEY_BLOOM_MAX_ROWS = 4096  # only files at/below this get a manifest bloom


def key_hash(values, ddl_types: list[str]) -> int:
    """h1 for a bucket-key tuple — Spark-parity Murmur3 (signed 32-bit)."""
    return spark_hash_typed(values, ddl_types)


def _positions(h1: int, m: int, k: int) -> list[int]:
    h2 = hash_int(h1 & 0xFFFFFFFF, 0x9747B28C) | 1  # odd → full period
    return [((h1 + i * h2) & 0xFFFFFFFFFFFFFFFF) % m for i in range(k)]


def build_bloom(
    hashes, m: int = KEY_BLOOM_BITS, k: int = KEY_BLOOM_K
) -> dict:
    """Manifest-embeddable bloom over pre-computed h1 values:
    ``{"m", "k", "z"}`` with ``z`` = base64(zlib(bit array))."""
    bits = bytearray(m // 8)
    for h1 in hashes:
        for p in _positions(h1, m, k):
            bits[p >> 3] |= 1 << (p & 7)
    return {"m": m, "k": k, "z": base64.b64encode(zlib.compress(bytes(bits))).decode()}


def bloom_contains(bloom: dict, h1: int) -> bool:
    """False ⇒ the key is PROVABLY absent from the file (no false
    negatives); True ⇒ maybe present (bounded false-positive rate)."""
    bits = zlib.decompress(base64.b64decode(bloom["z"]))
    for p in _positions(h1, int(bloom["m"]), int(bloom["k"])):
        if not bits[p >> 3] & (1 << (p & 7)):
            return False
    return True
