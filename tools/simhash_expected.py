#!/usr/bin/env python3
"""Independent reimplementation of graft.functions.Dedup.simHash64
(FNV-1a over UTF-16 code units + murmur fmix64 finalizer, both public
constructions) used to precompute the q_simhash fixture oracle values.

Run: python3 tools/simhash_expected.py
"""
M = (1 << 64) - 1


def fmix64(x: int) -> int:
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & M
    x ^= x >> 33
    x = (x * 0xC4CEB9FE1A85EC53) & M
    x ^= x >> 33
    return x


def hash64(s: str) -> int:
    h = 0xCBF29CE484222325
    for ch in s:
        h = ((h ^ ord(ch)) * 0x100000001B3) & M
    return fmix64(h)


def simhash(toks) -> int:
    acc = [0] * 64
    for t in toks:
        h = hash64(t)
        for j in range(64):
            acc[j] += 1 if (h >> j) & 1 else -1
    out = 0
    for j in range(64):
        if acc[j] > 0:
            out |= 1 << j
    return out - (1 << 64) if out >= (1 << 63) else out


FIXTURES = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumped over the lazy dog",
    "lorem ipsum dolor sit amet consectetur adipiscing elit",
    "a b a b a b",
    "",
]

if __name__ == "__main__":
    for i, t in enumerate(FIXTURES):
        toks = [x for x in t.split(" ") if x]
        print(f"fix_{i}", simhash(toks))
