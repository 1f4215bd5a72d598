"""One-shot deterministic BPE trainer → beats_spark/functions/bpe_merges.py.

Run: python scripts/train_bpe.py  (idempotent; the merges table is
checked in and this script only exists to document how it was built).

Training data: the deterministic sf0.1 documents table (TESTDATA.md;
fixed driver seed) plus a large seeded synthetic tail — morphological
English prose, multi-language code, log/NDJSON lines, and CJK lexeme
text — so the table carries ~12k merges (real-tokenizer depth on the
scripts whitespace tokenization misprices most) instead of the few
hundred the 31-word documents vocabulary alone can support. The algorithm is the standard byte-level BPE trainer (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword
Units"; byte alphabet as in GPT-2's public tokenizer): count symbol
pairs over the word-frequency table, merge the most frequent pair,
repeat. Ties break on the pair's bytes, so the table is reproducible
byte-for-byte on any host.
"""

from __future__ import annotations

import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from beats_spark.functions.bpe import PRETOK  # noqa: E402

N_MERGES = 12000
OUT = Path(__file__).resolve().parent.parent / "beats_spark" / "functions" / "bpe_merges.py"


# ~600 common English roots: the morphological generator below derives
# inflected/affixed forms from these, giving the trainer a realistic
# multi-thousand-word vocabulary (real text's merge depth comes from
# exactly this root × affix structure). All public dictionary words.
_ROOTS = """
time year people way day man thing woman life child world school state
family student group country problem hand part place case week company
system program question work government number night point home water
room mother area money story fact month lot right study book eye job
word business issue side kind head house service friend father power
hour game line end member law car city community name president team
minute idea body information back parent face others level office door
health person art war history party result change morning reason
research girl guy moment air teacher force education foot boy age
policy process music market sense nation plan college interest death
experience effect use class control care field development role effort
rate heart drug show leader light voice wife police mind price report
decision son view relationship town road arm difference value building
action model season society tax director position player record paper
space ground form event official matter center couple site project
activity star table need court oil situation cost industry figure
street image phone data picture practice piece land product doctor
wall patient worker news test movie north love support technology
management computer network server cluster memory storage query engine
stream batch partition shuffle broadcast filter join aggregate window
schema column table index vector token text document corpus sample
weight model train deploy monitor metric counter gauge latency error
warning debug trace config value string integer float boolean array
struct object method function return import export module package
request response client socket buffer channel thread process signal
handler parser writer reader logger router selector condition
transform enrich route drop rename convert decode encode compress
checkpoint lineage offset cursor registry harvester prospector
pipeline processor output input codec queue event message payload
header field tag label flag source sink topic broker consumer
producer session user agent transcript conversation turn role tool
timestamp duration interval bucket grain rollup sketch dedup
fingerprint shingle minhash simhash jaccard cosine embed cluster
centroid quality score language script charset unicode byte encode
walk run jump look move live believe hold bring happen write provide
sit stand lose pay meet include continue set learn lead understand
watch follow stop create speak read allow add spend grow open win
offer remember consider appear buy wait serve send expect build stay
fall cut reach kill remain suggest raise pass sell require report
decide pull return explain hope develop carry break receive agree
support hit produce eat cover catch draw choose cause point listen
realize place close involve increase describe reduce begin keep start
seem help talk turn show hear play move like want give use find tell
ask seem feel try leave call good new first last long great little
own other old right big high different small large next early young
important few public bad same able free sure better true whole real
strong certain late hard major possible special clear recent entire
final full local social political national common current available
likely single medical short personal open red difficult simple
natural significant similar hot dead central happy serious ready
deep white low official effective quick slow fast heavy bright dark
clean dirty empty modern ancient wide narrow thick thin loud quiet
rich poor safe dangerous
""".split()

_SUFFIXES = [
    "", "s", "ed", "ing", "er", "ers", "est", "ly", "ment", "ness",
    "tion", "able", "ful", "less", "ity",
]
_PREFIXES = ["", "re", "un", "pre", "over", "non", "multi", "inter", "de"]


def _english_vocab(rng) -> list[str]:
    """Deterministic morphological vocabulary: root × (prefix, suffix)
    combinations, a fixed seeded subset so the vocabulary is large
    (~6k forms) but not a full cross product (real lexicons aren't)."""
    vocab = list(dict.fromkeys(_ROOTS))
    for root in _ROOTS:
        for suf in rng.sample(_SUFFIXES, 5):
            pre = rng.choice(_PREFIXES)
            w = pre + root + suf
            vocab.append(w)
    return list(dict.fromkeys(vocab))


def _zipf_sampler(rng, items):
    """Seeded Zipf-weighted sampler (weight 1/rank): real word
    frequency structure, so the merge table's depth profile looks like
    a real corpus's rather than a uniform one."""
    import bisect

    cum = []
    tot = 0.0
    for i in range(len(items)):
        tot += 1.0 / (i + 1)
        cum.append(tot)

    def sample():
        return items[bisect.bisect_left(cum, rng.random() * tot)]

    return sample


def _seed_corpus() -> list[str]:
    """Deterministic training corpus (seeded rng only — rerunning
    reproduces bpe_merges.py byte-for-byte on any host):

    - the sf0.1 documents table (driver-seeded; 31-word vocabulary, so
      it anchors the domain words but cannot supply depth),
    - Zipf-sampled English prose over a ~6k-form morphological
      vocabulary (sentence case, punctuation, numbers),
    - code in several languages with identifiers compounded from the
      same roots (snake_case / camelCase), plus log lines and JSON in
      the pipeline's own dissect/NDJSON shapes,
    - CJK built from a pool of common hanzi/kana/hangul composed into
      reused multi-char lexemes (so multi-byte merges form).
    """
    import duckdb

    texts = [
        r[0]
        for r in duckdb.sql(
            "SELECT text FROM '/root/testdata/sf0.1/documents.parquet' ORDER BY doc_id"
        ).fetchall()
        if r[0]
    ]
    import random

    rng = random.Random(42)
    vocab = _english_vocab(rng)
    rng.shuffle(vocab)
    word = _zipf_sampler(rng, vocab)

    # --- English prose: sentence case, commas, numbers ---
    prose = []
    for _ in range(6000):
        n = rng.randint(8, 28)
        ws = [word() for _ in range(n)]
        ws[0] = ws[0].capitalize()
        if n > 12:
            ws[rng.randint(4, 8)] += ","
        if rng.random() < 0.15:
            ws[rng.randint(1, n - 1)] = str(rng.randint(1, 99999))
        prose.append(" ".join(ws) + rng.choice([".", ".", ".", "?", "!"]))

    # --- code: templates with identifiers from the same roots ---
    def ident():
        a, b = word(), word()
        return a + "_" + b if rng.random() < 0.5 else a + b.capitalize()

    code_templates = [
        "def {f}({a}, {b}):\n    return {a} + {b} * {n}\n",
        "for {a} in range({n}):\n    print({a}, {a} * 2)\n",
        'if {a} != nil {{\n\treturn fmt.Errorf("{f}: %w", {a})\n}}\n',
        "SELECT {a}, count(*) FROM {b} WHERE {f} = '{c}' GROUP BY {a};\n",
        "const {a} = {b}.filter(v => v != null).map(v => v.{c});\n",
        "import numpy as np\n{a} = np.zeros(({n}, {n}), dtype=np.float32)\n",
        "class {F}:\n    def __init__(self, {a}):\n        self.{a} = {a}\n",
        'log.warn("retrying {f} id={{}} after {{}}ms", {a}, {b});\n',
        "func {F}({a} string) (int, error) {{\n\treturn len({a}), nil\n}}\n",
        "public static {F} of(String {a}) {{ return new {F}({a}); }}\n",
        "let {a}: Vec<u64> = {b}.iter().map(|x| x + {n}).collect();\n",
        "{a} = [{b} for {b} in {c} if {b} is not None]\n",
    ]
    code = [
        rng.choice(code_templates).format(
            f=ident(), a=ident(), b=ident(), c=word(),
            F=ident().capitalize(), n=rng.randint(1, 512),
        )
        for _ in range(4000)
    ]

    # --- log lines + NDJSON (the pipeline's own parse shapes) ---
    levels = ["info", "warn", "error", "debug"]
    logs = []
    for _ in range(3000):
        ts = (
            f"2026-0{rng.randint(1, 9)}-{rng.randint(10, 28)}"
            f"T{rng.randint(10, 23)}:{rng.randint(10, 59)}:{rng.randint(10, 59)}Z"
        )
        logs.append(
            f"level={rng.choice(levels)} ts={ts} caller={ident()}.go:"
            f"{rng.randint(10, 999)} msg=\"{word()} {word()} {word()}\""
        )
        if rng.random() < 0.5:
            logs.append(
                '{"conv_id": "c%d", "turn_idx": %d, "role": "%s", '
                '"tool": "%s", "text": "%s %s"}'
                % (
                    rng.randint(0, 9999), rng.randint(0, 99),
                    rng.choice(["user", "assistant", "tool", "system"]),
                    rng.choice(["search", "python", "bash", "none"]),
                    word(), word(),
                )
            )

    # --- CJK: reused multi-char lexemes over common character pools ---
    hanzi = (
        "的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年"
        "得就那要下以生会自着去之过家学对可她里后小么心多天而能好都然"
        "没日于起还发成事只作当想看文无开手十用主行方又如前所本见经头"
        "面公同三已老从动两长知民样现分将外但身些与高意进把法此实回二"
        "理美点月明器其种声全工己话儿者向情部正名定女问力机给等几很业"
        "最间新什打便位因重被走电四第门相次东政海口使教西再平真听世气"
        "信北少关并内加化但据处理系统数网络服务程序设计算法模型训练"
    )
    kana = (
        "あいうえおかきくけこさしすせそたちつてとなにぬねのはひふへほ"
        "まみむめもやゆよらりるれろわをんがぎぐげござじずぜぞだぢづでど"
        "ばびぶべぼぱぴぷぺぽアイウエオカキクケコサシスセソタチツテト"
        "ナニヌネノハヒフヘホマミムメモヤユヨラリルレロワヲンー"
    )
    hangul = (
        "가나다라마바사아자차카타파하고노도로모보소오조초코토포호구누"
        "두루무부수우주추쿠투푸후그느드르므브스으즈츠크트프흐기니디리"
        "미비시이지치키티피히는을를에서의와과로부터까지처럼보다"
    )

    def _lexemes(pool, n, lo, hi):
        return [
            "".join(rng.choice(pool) for _ in range(rng.randint(lo, hi)))
            for _ in range(n)
        ]

    zh = _lexemes(hanzi, 700, 1, 3)
    ja = _lexemes(hanzi[:80] + kana, 500, 1, 4)
    ko = _lexemes(hangul, 400, 1, 3)
    cjk = []
    for lex, end in ((zh, "。"), (ja, "。"), (ko, ". ")):
        s = _zipf_sampler(rng, lex)
        for _ in range(1500):
            cjk.append("".join(s() for _ in range(rng.randint(4, 12))) + end)

    return texts + prose + code + logs + cjk


def train_naive(texts: list[str], n_merges: int) -> list[tuple[bytes, bytes]]:
    """Reference trainer: full pair recount every merge. O(n_merges ×
    |word table|) — fine for hundreds of merges, hours for 10k+. Kept
    as the ground truth the fast trainer is tested against
    (tests/test_bpe.py::test_fast_trainer_matches_naive)."""
    words: Counter[tuple[bytes, ...]] = Counter()
    for t in texts:
        for piece in PRETOK.findall(t):
            b = piece.encode("utf-8")
            words[tuple(bytes([x]) for x in b)] += 1

    merges: list[tuple[bytes, bytes]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[bytes, bytes]] = Counter()
        for sym, n in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        # deterministic: max count, then lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_words: Counter[tuple[bytes, ...]] = Counter()
        for sym, n in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] += n
        words = new_words
    return merges


def train(texts: list[str], n_merges: int) -> list[tuple[bytes, bytes]]:
    """Fast exact trainer: same argmin sequence as :func:`train_naive`
    (max pair count, ties by lexicographically smallest pair), but
    incremental — a pair→words occurrence index means each merge only
    rescans the words that actually CONTAIN the winning pair, and a
    lazy max-heap replaces the full Counter scan. Every count change
    pushes a fresh heap entry; popped entries whose count is stale are
    skipped, so the pop is always the true (count, pair) minimum of
    (-count, pair) — identical tie-breaking to the naive min()."""
    import heapq
    from collections import defaultdict

    words: Counter[tuple[bytes, ...]] = Counter()
    for t in texts:
        for piece in PRETOK.findall(t):
            b = piece.encode("utf-8")
            words[tuple(bytes([x]) for x in b)] += 1

    pairs: Counter[tuple[bytes, bytes]] = Counter()
    index: defaultdict[tuple[bytes, bytes], set] = defaultdict(set)
    for sym, n in words.items():
        for a, b in zip(sym, sym[1:]):
            pairs[(a, b)] += n
            index[(a, b)].add(sym)
    heap = [(-c, p) for p, c in pairs.items()]
    heapq.heapify(heap)

    merges: list[tuple[bytes, bytes]] = []
    while len(merges) < n_merges and heap:
        neg_c, best = heapq.heappop(heap)
        if pairs.get(best, 0) != -neg_c:
            continue  # stale entry; the current count was re-pushed
        if -neg_c < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        touched: set[tuple[bytes, bytes]] = set()
        for sym in list(index[best]):
            n = words.pop(sym, None)
            if n is None:
                continue
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] -= n
                touched.add((a, b))
                index[(a, b)].discard(sym)
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new = tuple(out)
            words[new] += n
            for a, b in zip(new, new[1:]):
                pairs[(a, b)] += n
                touched.add((a, b))
                index[(a, b)].add(new)
        for p in touched:
            c = pairs.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p))
            else:
                pairs.pop(p, None)
                index.pop(p, None)
    return merges


def main() -> None:
    merges = train(_seed_corpus(), N_MERGES)
    with OUT.open("w") as f:
        f.write('"""Checked-in BPE merges table (generated by scripts/train_bpe.py;\n')
        f.write("do not edit by hand). Each entry is a (left, right) byte-string\n")
        f.write('pair; rank = list index."""\n\n')
        f.write("MERGES: list[tuple[bytes, bytes]] = [\n")
        for a, b in merges:
            f.write(f"    ({a!r}, {b!r}),\n")
        f.write("]\n")
    print(f"wrote {len(merges)} merges to {OUT}")


if __name__ == "__main__":
    main()
