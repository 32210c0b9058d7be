"""Shared synthetic corpora for tests and benchmarks."""

import random


def mixed(size: int, seed: int = 0) -> bytes:
    """Mixed-entropy: text spans, byte runs, zero runs."""
    rng = random.Random(seed)
    out = bytearray()
    while len(out) < size:
        r = rng.random()
        if r < 0.4:
            out += bytes(rng.choices(b"abcdefgh \n", k=rng.randint(5, 80)))
        elif r < 0.7:
            out += bytes([rng.randint(1, 255)]) * rng.randint(1, 700)
        else:
            out += b"\x00" * rng.randint(1, 30)
    return bytes(out[:size])


def text(size: int, seed: int = 0) -> bytes:
    rng = random.Random(seed)
    words = [bytes(rng.choices(b"etaoinshrdlucmfwyp", k=rng.randint(2, 9)))
             for _ in range(200)]
    out = bytearray()
    while len(out) < size:
        out += rng.choice(words) + b" "
        if rng.random() < 0.1:
            out += b"\n"
    return bytes(out[:size])


def incompressible(size: int, seed: int = 0) -> bytes:
    rng = random.Random(seed)
    return rng.randbytes(size)


def runs_heavy(size: int, seed: int = 0) -> bytes:
    rng = random.Random(seed)
    out = bytearray()
    while len(out) < size:
        out += bytes([rng.randint(0, 255)]) * rng.randint(1, 1000)
    return bytes(out[:size])


def edge_cases() -> dict[str, bytes]:
    return {
        "all_zero": b"\x00" * 2048,
        "all_one_symbol": b"G" * 4096,
        "run_255": b"\x07" * 255 + b"x",
        "run_256": b"\x07" * 256 + b"x",
        "run_259": b"\x07" * 259,  # 255-escape + 4-run escape
        "run_257": b"\x07" * 257,  # 255-escape + 2 literals
        "alternating": bytes([1, 2] * 1024),
        "three_runs": b"aaabbbccc" * 200,
        "zero_singles": bytes([5, 0, 6, 0, 7] * 500),
        "ascending": bytes(range(256)) * 8,
        "boundary_run": b"x" * 1020 + b"y" * 8,
    }
