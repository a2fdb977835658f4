"""Deterministic partitioned Cuckoo filter shards (URL-seen sketch).

The north star names a "bloom/cuckoo URL-seen filter"; this is the
cuckoo half (Fan, Andersen, Kaminsky, Mitzenmacher, "Cuckoo Filter:
Practically Better Than Bloom", CoNEXT'14). Same sharding/serialize
contract as :mod:`crawl.bloom` so the frontier can swap families, plus
the property Bloom cannot offer: **deletion** — the capability the
recrawl scheduler needs to make a stale URL fetchable again without
rebuilding the whole seen set (crawl/recrawl.py reads the CDX index,
elects stale captures, and *forgets* them here).

Partial-key cuckoo hashing over ``n_buckets`` (power of two) buckets
of ``slots`` fingerprints:

    fp  = low ``fp_bits`` of h1, forced nonzero (0 marks a free slot)
    i1  = h2 mod n_buckets
    i2  = i1 XOR (murmur-mix(fp) mod n_buckets)

``alt(alt(i)) == i`` — a fingerprint found in bucket ``b`` can always
be re-homed using only ``(b, fp)``, which is what makes shard *merge*
possible (re-insert the other table's fingerprints) even though cuckoo
tables, unlike Bloom bit arrays, cannot be OR-merged.

Bucket rows keep nonzero fingerprints **prefix-dense** (delete
back-fills the hole with the row's last occupant), so insertion is
"first free slot = occupancy index" and the batch insert vectorizes.

Determinism: inserts are a pure function of the (deduplicated) input
hash set and insertion order is made irrelevant by the membership
pre-check — re-adding an already-present batch is a no-op, the same
idempotence the Bloom OR-merge gives checkpoint replay.

Space: bits/item ≈ fp_bits / 0.95 load ≈ 8.4/16.8/33.7 for
fp_bits 8/16/32 vs Bloom's 1.44·log2(1/fp). At fp≈1e-3 the two are
comparable; below ~1.2e-4 the 32-bit fingerprint costs ~1.7× Bloom —
the price of deletability, chosen per-crawl via CrawlConfig.
"""

from __future__ import annotations

import math

from .bloom import FAMILY_NONE, FAMILY_XX64

_MAGIC = b"CK"
_FORMAT_VERSION = 1
_MAX_KICKS = 500
_LOAD_FACTOR = 0.95
_MIX = 0x5BD1E995  # murmur2 multiplier — spreads fp into the XOR offset


def _np():
    import numpy as np

    return np


class CuckooShard:
    """Fixed-geometry cuckoo filter over a numpy fingerprint table."""

    __slots__ = ("n_buckets", "slots", "fp_bits", "table", "n_items", "family")

    def __init__(
        self,
        n_buckets: int,
        slots: int = 4,
        fp_bits: int = 16,
        table=None,
        n_items: int = 0,
        family: int = FAMILY_NONE,
    ):
        if n_buckets & (n_buckets - 1):
            raise ValueError("n_buckets must be a power of two (alt-index XOR)")
        if fp_bits not in (8, 16, 32):
            raise ValueError("fp_bits must be 8, 16 or 32 (table dtype)")
        np = _np()
        self.n_buckets = n_buckets
        self.slots = slots
        self.fp_bits = fp_bits
        dtype = {8: np.uint8, 16: np.uint16, 32: np.uint32}[fp_bits]
        self.table = (
            table if table is not None else np.zeros((n_buckets, slots), dtype=dtype)
        )
        self.n_items = n_items
        self.family = family

    @classmethod
    def sized_for(cls, expected_items: int, fp_rate: float = 1e-3) -> "CuckooShard":
        """Geometry for ``expected_items`` at ≤ ``fp_rate``: smallest
        supported fingerprint width with 2·slots/2^fp_bits ≤ fp_rate,
        buckets sized for 0.95 load (kick loop stays short below it).
        """
        slots = 4
        fp_bits = next(
            (b for b in (8, 16, 32) if (2 * slots) / (1 << b) <= fp_rate), 32
        )
        need = max(1, math.ceil(expected_items / (slots * _LOAD_FACTOR)))
        n_buckets = 1 << max(1, (need - 1).bit_length())
        return cls(n_buckets, slots, fp_bits)

    # -- hash plumbing ---------------------------------------------------
    #
    # Same JVM-computed (h1, h2) int64 pair the Bloom path ships through
    # Arrow (crawl/frontier.py::_bloom_hash_cols) — the sketch families
    # are interchangeable downstream of the hash columns.

    def _claim_family(self, fam: int, op: str) -> None:
        if self.family == FAMILY_NONE:
            self.family = fam
        elif self.family != fam:
            raise ValueError(
                f"hash-family mismatch: {op} uses family {fam} but this "
                f"sketch was built with family {self.family}"
            )

    def _fp_i1_i2(self, h1, h2):
        np = _np()
        mask = np.uint64(self.n_buckets - 1)
        fp64 = np.asarray(h1, dtype=np.int64).view(np.uint64) & np.uint64(
            (1 << self.fp_bits) - 1
        )
        fp64 = np.where(fp64 == 0, np.uint64(1), fp64)  # 0 = empty slot
        i1 = np.asarray(h2, dtype=np.int64).view(np.uint64) & mask
        i2 = i1 ^ ((fp64 * np.uint64(_MIX)) & mask)
        return fp64.astype(self.table.dtype), i1.astype(np.int64), i2.astype(np.int64)

    def _alt(self, bucket: int, fp: int) -> int:
        return int(
            (bucket ^ ((fp * _MIX) & (self.n_buckets - 1))) & (self.n_buckets - 1)
        )

    # -- membership ------------------------------------------------------

    def contains_many_i64(self, h1, h2):
        np = _np()
        if self.family not in (FAMILY_NONE, FAMILY_XX64):
            raise ValueError(
                "hash-family mismatch: contains_many_i64 probes xxhash64 "
                f"but this sketch was built with family {self.family}"
            )
        fp, i1, i2 = self._fp_i1_i2(h1, h2)
        col = fp[:, None]
        return np.any(self.table[i1] == col, axis=1) | np.any(
            self.table[i2] == col, axis=1
        )

    # -- insert ----------------------------------------------------------

    def _occupancy(self, buckets):
        np = _np()
        return np.count_nonzero(self.table[buckets], axis=1)

    def _place_pass(self, fp, buckets):
        """One vectorized placement pass: within each target bucket,
        rank the batch's items; item ``r`` of a bucket with occupancy
        ``o`` lands in slot ``o + r`` when that fits (prefix-dense
        invariant ⇒ slots ``o..`` are free). Returns the boolean mask
        of items placed."""
        np = _np()
        order = np.argsort(buckets, kind="stable")
        bs = buckets[order]
        first = np.searchsorted(bs, bs)  # first index of each run
        rank = np.arange(len(bs)) - first
        occ = self._occupancy(bs)
        slot = occ + rank
        ok = slot < self.slots
        self.table[bs[ok], slot[ok]] = fp[order][ok]
        placed = np.zeros(len(fp), dtype=bool)
        placed[order[ok]] = True
        return placed

    def _insert_with_kicks(self, fp: int, bucket: int) -> None:
        """Scalar relocation path for the overflow remainder — the
        classic cuckoo evict loop. Deterministic victim choice (kick
        counter mod slots), fail-fast past _MAX_KICKS: a shard driven
        past its load factor must raise, not silently degrade."""
        cur_fp, cur_b = int(fp), int(bucket)
        for kick in range(_MAX_KICKS):
            row = self.table[cur_b]
            occ = int((row != 0).sum())
            if occ < self.slots:
                row[occ] = cur_fp
                return
            victim_slot = kick % self.slots
            cur_fp, row[victim_slot] = int(row[victim_slot]), cur_fp
            cur_b = self._alt(cur_b, cur_fp)
        raise ValueError(
            f"cuckoo shard over capacity: {self.n_items} items in "
            f"{self.n_buckets}x{self.slots} table exceeded {_MAX_KICKS} "
            "kicks — size shards with sized_for(expected_items) or raise "
            "expected_per_shard"
        )

    def add_many_i64(self, h1, h2) -> int:
        """Insert a batch; returns how many were NEW (membership
        pre-check makes replaying a batch a no-op — the idempotence
        the crawl checkpoint contract requires). Vectorized: dedup,
        pre-check, one placement pass per candidate bucket; only items
        whose both buckets are full fall to the scalar kick loop
        (empty below the design load factor)."""
        np = _np()
        self._claim_family(FAMILY_XX64, "add_many_i64()")
        fp, i1, i2 = self._fp_i1_i2(h1, h2)
        # in-batch dedup on (i1, fp) — one slot per distinct key
        _, keep = np.unique(
            np.stack([i1, fp.astype(np.int64)]), axis=1, return_index=True
        )
        fp, i1, i2 = fp[keep], i1[keep], i2[keep]
        col = fp[:, None]
        fresh = ~(
            np.any(self.table[i1] == col, axis=1)
            | np.any(self.table[i2] == col, axis=1)
        )
        fp, i1, i2 = fp[fresh], i1[fresh], i2[fresh]
        n_new = len(fp)
        if n_new:
            placed = self._place_pass(fp, i1)
            if not placed.all():
                rem = ~placed
                placed2 = self._place_pass(fp[rem], i2[rem])
                for f, b in zip(fp[rem][~placed2], i1[rem][~placed2]):
                    self._insert_with_kicks(int(f), int(b))
        self.n_items += n_new
        return n_new

    # -- delete ----------------------------------------------------------

    def delete_many_i64(self, h1, h2):
        """Remove one matching fingerprint per input item (bucket i1
        first, then i2), back-filling the freed slot from the row's
        tail to keep buckets prefix-dense. Returns a bool array —
        True where a fingerprint was found and removed.

        Standard cuckoo caveat: deleting an item that was never
        inserted can evict a colliding member's fingerprint (breaking
        its no-false-negative guarantee) — callers delete only URLs
        the seen set actually contains (the recrawl scheduler reads
        them from the crawl's own CDX index). Maintenance path, scalar
        per item by design: the delete set (stale recrawl electees) is
        orders smaller than the probe/build hot path."""
        np = _np()
        if self.family not in (FAMILY_NONE, FAMILY_XX64):
            raise ValueError(
                "hash-family mismatch: delete_many_i64 probes xxhash64 "
                f"but this sketch was built with family {self.family}"
            )
        fp, i1, i2 = self._fp_i1_i2(h1, h2)
        out = np.zeros(len(fp), dtype=bool)
        for k in range(len(fp)):
            for b in (int(i1[k]), int(i2[k])):
                row = self.table[b]
                hits = np.nonzero(row == fp[k])[0]
                if len(hits):
                    last = int((row != 0).sum()) - 1
                    row[hits[0]] = row[last]
                    row[last] = 0
                    self.n_items -= 1
                    out[k] = True
                    break
        return out

    # -- merge -----------------------------------------------------------

    def merge(self, other: "CuckooShard") -> "CuckooShard":
        """Fold ``other``'s fingerprints into a copy of ``self`` by
        re-insertion — sound because {bucket, alt(bucket, fp)} is
        closed under the XOR re-home, so an occupant's two legal homes
        are recoverable from where it sits. Duplicate (bucket, fp)
        pairs across the two shards collapse to one slot (same rule as
        a Bloom OR)."""
        if not isinstance(other, CuckooShard):
            raise ValueError(
                f"cannot merge a cuckoo shard with {type(other).__name__} — "
                "sketch families don't mix within one shard table"
            )
        if (self.n_buckets, self.slots, self.fp_bits) != (
            other.n_buckets,
            other.slots,
            other.fp_bits,
        ):
            raise ValueError("incompatible shard geometry")
        if FAMILY_NONE not in (self.family, other.family) and self.family != other.family:
            raise ValueError(
                f"hash-family mismatch: cannot merge family {self.family} "
                f"with family {other.family}"
            )
        np = _np()
        merged = CuckooShard(
            self.n_buckets,
            self.slots,
            self.fp_bits,
            table=self.table.copy(),
            n_items=self.n_items,
            family=self.family if self.family != FAMILY_NONE else other.family,
        )
        buckets, slots_idx = np.nonzero(other.table)
        for b, s in zip(buckets, slots_idx):
            f = int(other.table[b, s])
            row = merged.table[b]
            alt = merged._alt(int(b), f)
            if (row == f).any() or (merged.table[alt] == f).any():
                continue  # same (bucket, fp) key already present
            occ = int((row != 0).sum())
            if occ < merged.slots:
                row[occ] = f
            else:
                merged._insert_with_kicks(f, int(b))
            merged.n_items += 1
        return merged

    # -- serialization (parquet BINARY column payload) -------------------
    #
    # Header: magic "CK" + version + hash-family + fp_bits(1), then
    # n_buckets(8) slots(1) n_items(8) big-endian, then the table
    # little-endian row-major. Distinct magic from Bloom's "BS" makes
    # persisted crawl state self-describing — frontier merge/probe
    # dispatch on it (crawl/frontier.py::sketch_from_bytes).

    def to_bytes(self) -> bytes:
        np = _np()
        head = (
            _MAGIC
            + _FORMAT_VERSION.to_bytes(1, "big")
            + self.family.to_bytes(1, "big")
            + self.fp_bits.to_bytes(1, "big")
            + self.n_buckets.to_bytes(8, "big")
            + self.slots.to_bytes(1, "big")
            + self.n_items.to_bytes(8, "big")
        )
        return head + self.table.astype(self.table.dtype.newbyteorder("<")).tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "CuckooShard":
        np = _np()
        if len(raw) < 22 or raw[0:2] != _MAGIC:
            raise ValueError("not a cuckoo sketch payload (magic mismatch)")
        version, family, fp_bits = raw[2], raw[3], raw[4]
        if version != _FORMAT_VERSION:
            raise ValueError(f"unsupported cuckoo sketch format version {version}")
        if family not in (FAMILY_NONE, FAMILY_XX64):
            raise ValueError(f"unknown cuckoo sketch hash-family tag {family}")
        if fp_bits not in (8, 16, 32):
            raise ValueError(f"unknown cuckoo fingerprint width {fp_bits}")
        n_buckets = int.from_bytes(raw[5:13], "big")
        slots = raw[13]
        n_items = int.from_bytes(raw[14:22], "big")
        dtype = {8: np.uint8, 16: np.uint16, 32: np.uint32}[fp_bits]
        table = (
            np.frombuffer(raw[22:], dtype=np.dtype(dtype).newbyteorder("<"))
            .astype(dtype)
            .reshape(n_buckets, slots)
            .copy()
        )
        return cls(n_buckets, slots, fp_bits, table, n_items, family)
