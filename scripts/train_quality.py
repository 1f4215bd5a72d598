"""One-shot deterministic quality-classifier trainer →
beats_spark/functions/quality_model.py.

Run: python scripts/train_quality.py  (idempotent; the weight table is
checked in and this script only exists to document how it was built).

The model is the public fastText-style linear quality filter used by
the CCNet / GPT-3 / FineWeb data pipelines: a logistic regression over
hashed bag-of-words features, positive class = "prose-like, keep".
Because no labeled web corpus ships with this sandbox, the training
set is SYNTHETIC and fully deterministic (seeded PRNG): positives are
sentence-shaped prose built from a function-word + content-word
vocabulary with normal punctuation; negatives are the classic junk
modes those pipelines downrank — keyword stuffing, token repetition,
ALL-CAPS shouting, digit/URL/symbol soup, and nav-menu boilerplate.
The learned weights therefore encode generic junk SHAPE (repetition,
symbol density, stuffing) through the hashed vocabulary, not any real
site's content.

Features: md5-hashed unigram buckets (the repo's sample_hash keying,
seed 11, 256 buckets) over normalize_text tokens, MEAN-pooled (counts
divided by token count) so document length cancels; inference can
then score with an integer milli division that DuckDB replays exactly.
Training: plain SGD logistic regression, fixed epochs / learning rate
/ shuffle order — reproducible bit-for-bit on any host. Weights are
quantized to integer milli units before freezing; the script prints
held-out accuracy before and after quantization and refuses to write
a table that scores below 0.95.
"""

from __future__ import annotations

import hashlib
import math
import random
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SEED = 11
N_BUCKETS = 256
EPOCHS = 30
LR = 0.5
OUT = (
    Path(__file__).resolve().parent.parent
    / "beats_spark"
    / "functions"
    / "quality_model.py"
)

FUNCTION_WORDS = (
    "the a an of to in and is was for on with as by that it from at "
    "this be are were or not which but had has have his her their its "
    "they we you he she there when where how what why then than so if"
).split()
CONTENT_WORDS = (
    "government research market history company science system water "
    "energy music language country building mountain question problem "
    "development information analysis report community economy nature "
    "student teacher family morning winter garden window village river "
    "project service culture industry theory network library century "
    "article author reader writer journey weather station market design"
).split()
SPAM_WORDS = (
    "cheap buy now click here free offer deal sale discount casino "
    "winner prize viagra loan credit pills subscribe limited exclusive"
).split()
NAV_WORDS = "home about contact login register privacy terms sitemap faq".split()


def normalize(text: str) -> str:
    return re.sub(r"\s+", " ", text.lower()).strip()


def bucket(tok: str) -> int:
    h = hashlib.md5(f"s{SEED}|{tok}".encode()).hexdigest()[:15]
    return int(h, 16) % N_BUCKETS


def features(text: str) -> dict[int, float]:
    toks = [t for t in normalize(text).split(" ") if t]
    if not toks:
        return {}
    x: dict[int, float] = {}
    inv = 1.0 / len(toks)
    for t in toks:
        b = bucket(t)
        x[b] = x.get(b, 0.0) + inv
    return x


def make_positive(rng: random.Random) -> str:
    sents = []
    for _ in range(rng.randint(2, 5)):
        n = rng.randint(6, 14)
        words = []
        for i in range(n):
            pool = FUNCTION_WORDS if (i % 2 == 0) else CONTENT_WORDS
            words.append(rng.choice(pool))
        s = " ".join(words)
        sents.append(s[0].upper() + s[1:] + rng.choice([".", ".", ".", "?"]))
    return " ".join(sents)


def make_negative(rng: random.Random) -> str:
    mode = rng.randrange(5)
    if mode == 0:  # keyword stuffing
        return " ".join(rng.choice(SPAM_WORDS) for _ in range(rng.randint(10, 30)))
    if mode == 1:  # token repetition
        w = rng.choice(SPAM_WORDS + CONTENT_WORDS)
        return " ".join([w] * rng.randint(8, 25))
    if mode == 2:  # shouting
        return " ".join(
            rng.choice(SPAM_WORDS).upper() + "!!!" for _ in range(rng.randint(6, 15))
        )
    if mode == 3:  # digit / url / symbol soup
        bits = []
        for _ in range(rng.randint(8, 20)):
            bits.append(
                rng.choice(
                    [
                        str(rng.randrange(10**6)),
                        "http://x%d.biz" % rng.randrange(1000),
                        "$$$",
                        "%%%",
                        "###",
                    ]
                )
            )
        return " ".join(bits)
    # nav-menu boilerplate
    return " | ".join(rng.choice(NAV_WORDS) for _ in range(rng.randint(5, 12)))


def main() -> None:
    rng = random.Random(42)
    data = [(make_positive(rng), 1) for _ in range(800)] + [
        (make_negative(rng), 0) for _ in range(800)
    ]
    rng.shuffle(data)
    train, held = data[:1200], data[1200:]

    w = [0.0] * N_BUCKETS
    b = 0.0
    order = list(range(len(train)))
    for _epoch in range(EPOCHS):
        rng.shuffle(order)
        for i in order:
            text, y = train[i]
            x = features(text)
            z = b + sum(w[k] * v for k, v in x.items())
            p = 1.0 / (1.0 + math.exp(-max(-30.0, min(30.0, z))))
            g = p - y
            b -= LR * g
            for k, v in x.items():
                w[k] -= LR * g * v

    def acc(weights, bias, milli: bool) -> float:
        ok = 0
        for text, y in held:
            x = features(text)
            if milli:
                toks = sum(1 for t in normalize(text).split(" ") if t)
                s = bias + (
                    sum(weights[k] * round(v * toks) for k, v in x.items())
                    // max(toks, 1)
                    if toks
                    else 0
                )
                pred = 1 if s >= 0 else 0
            else:
                z = bias + sum(weights[k] * v for k, v in x.items())
                pred = 1 if z >= 0 else 0
            ok += pred == y
        return ok / len(held)

    a_float = acc(w, b, milli=False)
    wm = [round(x * 1000) for x in w]
    bm = round(b * 1000)
    a_milli = acc(wm, bm, milli=True)
    print(f"held-out accuracy float={a_float:.4f} milli={a_milli:.4f}")
    if a_milli < 0.95:
        raise SystemExit("quantized accuracy below 0.95 — not freezing")

    lines = [
        '"""FROZEN fastText-style quality-classifier weights.',
        "",
        "Generated by scripts/train_quality.py (deterministic — seeded",
        "synthetic corpus, fixed SGD schedule); do not hand-edit. The",
        "table is pinned by tests/test_quality_model.py; retraining must",
        "update that pin. Score of a document =",
        "QUALITY_BIAS_MILLI + (sum of per-token bucket weights) div",
        "n_tokens, buckets = sample_hash(token, QUALITY_SEED) %",
        'QUALITY_BUCKETS over normalize_text whitespace tokens."""',
        "",
        f"QUALITY_SEED = {SEED}",
        f"QUALITY_BUCKETS = {N_BUCKETS}",
        f"QUALITY_BIAS_MILLI = {bm}",
        f"HELDOUT_ACC_MILLI = {a_milli:.4f}",
        "",
        "QUALITY_WEIGHTS_MILLI: tuple[int, ...] = (",
    ]
    for i in range(0, N_BUCKETS, 10):
        chunk = ", ".join(str(v) for v in wm[i : i + 10])
        lines.append(f"    {chunk},")
    lines.append(")")
    lines.append("")
    OUT.write_text("\n".join(lines), encoding="utf-8")
    print(f"wrote {OUT} ({N_BUCKETS} weights, bias {bm})")


if __name__ == "__main__":
    main()
