"""Deterministic 12-column test-row generator (fixture oracle).

Python realization of the reference's procedural test fixture
(reference t/TestRow.pm:36-96): every column of row ``n`` derives from
``n`` alone, so ``check()`` can regenerate any row from its first
column and assert exact equality — the reference's own round-trip
test strategy (usage: reference scripts/dbitool.pl:3273-3276).

Validated byte-for-byte against the reference generator's output for
n in [0, 1000) (tests/test_testrow.py ships a golden-file check).

Semantics preserved deliberately (quirks included, they stress
format edges):
- the ``int32`` column may exceed 32 bits (the XOR operand is a
  64-bit product); ``hex`` is the hex of that full value;
- ``float`` renders the low-32 bits reinterpreted as a native-endian
  float32, printed with 6 fixed decimals (negative NaN keeps its
  sign, as C printf does);
- the ``date`` day field is ``b2 >> 4`` and may be "00" — an
  intentional oddity of the generator, kept for fidelity;
- ``uuencode`` is the uuencoding of the *decimal string* of the
  value, backtick-padded, with any literal ``,"'`` sequence removed —
  punctuation-heavy on purpose to stress CSV quoting.
"""

from __future__ import annotations

import binascii
import math
import struct

# 256-word table (reference t/TestRow.pm:27). Data constant, not code.
WORDS = (
    "cleanups twinge unkinger studying footers jowars whileen laurus recrates "
    "michabou aiglets jokier staghead acronyx kirsten llareta hothead membrane "
    "cheapens unrolled reactive twattles waddent washtub margent anosmia "
    "servings sarcode baloneys onerate untilt outmoded archduxe cyclamin "
    "watsonia magellan largando triptyca monogerm gangster favonius araneous "
    "estuous jabots magnetic conjoint nuthatch santonic filters nomisms "
    "tumulose swiftest custards wingcut cowgirls riziform zeoidei coulters "
    "vauntie grappler sexlike sperms boydekyn agrised maintain apparens "
    "rancidly tartarum naturism kistfuls dribblet tangoed divinity fuzing "
    "adermin mocking boorish graded porkchop bequalm offshore decedent wagwit "
    "humblest abietin conusant mangels weighman finary choragic voiced oakwood "
    "aconic unsallow sevres realms terence unheaded spooner musicker bedress "
    "haircaps cuculus accouter nalita enteroid momish piccanin rachitis "
    "unvirtue cafila newline stench solera spilled grownups ilongot lecithin "
    "egritude adjoiner spacial bunters moonlit slidder ethide exostema seamed "
    "trickers invade reseed verdun quantal kepped schemas silladar antihuff "
    "hederin venulae rocaille bareboat gunpoint humiria bumbarge pemphix "
    "rupert aglaspis puslike saurian muhlies affiches washery reposal digonous "
    "aquilia largish medleys belabor yerbales bimedial bawbees nances welladay "
    "cities reflet defeated tickless coynye dogteeth mellone tiresome amakebe "
    "civitan cabler herling vandal lionize pablum hubbuboo commixes highroad "
    "illumed fulmarus scorpius ratify scuttle semiruin crankle moduli jubilize "
    "drawers sandmen stabbed dumdums tridii homogeny sogdoite cabbagy metiers "
    "outlets dukely elemong enthrill devalues chastity khalifat shiftily "
    "patios sweetest chagoma bathmat dading ricking verdugo tetrapla lamboy "
    "infernos jazzes dinette ruglike winging unspread unegal unmeated dhobee "
    "shoulder caladium violater velika quetch hornbeak pinnate docile ragusye "
    "inkweed gemara pungies reattire bludgeon niceling aleppo clergy koorhmn "
    "deacon figuring druidic gallnuts girondin unsourly prasine saladero "
    "bingey torpids crinel drawgate cinerea nubbly"
).split()

HEADER = (
    "row", "int32", "float", "date", "hex", "binary", "uuencode",
    "byte1", "byte2", "byte3", "byte4", "string",
)


def _fmt_f(v: float) -> str:
    """Perl sprintf %f semantics: fixed 6 decimals, NaN prints as
    "NaN" regardless of sign (validated against the reference
    generator's output)."""
    if math.isnan(v):
        return "NaN"
    return "%f" % v


def _uu(value: int) -> str:
    """uuencode of the decimal string, backtick-padded one-liner,
    with any literal `,\"'` 3-char sequence removed."""
    line = binascii.b2a_uu(str(value).encode(), backtick=True).decode().rstrip("\n")
    return line.replace(",\"'", "")


def row(n: int) -> tuple:
    """Row ``n`` as a 12-tuple of (int, int, str*5, int*4, str)."""
    word4 = struct.unpack(">I", WORDS[n & 255].encode()[:4])[0]
    s = word4 ^ (0x82084211 * ((n + 15) >> 1))
    b = struct.unpack("4B", struct.pack(">I", s & 0xFFFFFFFF))
    f32 = struct.unpack("=f", struct.pack(">I", s & 0xFFFFFFFF))[0]
    date = "%04d-%02d-%02dT%02d:%02d:%02d" % (
        1990 + b[0] % 40, b[1] % 12 + 1, b[2] >> 4, b[2] % 24, b[3] >> 3, b[3] % 60,
    )
    return (
        n,
        s,
        _fmt_f(f32),
        date,
        "%x" % s,
        "{:b}{:b}".format(b[3], b[0]),
        _uu(s),
        b[0], b[1], b[2], b[3],
        " ".join(WORDS[b[i]] for i in range(4)),
    )


def rows(n: int) -> list[tuple]:
    return [row(i) for i in range(n)]


def check(r: tuple) -> None:
    """Exact-value oracle: regenerate from column 0 and compare
    stringwise (the wire is untyped — reference semantics)."""
    expected = row(int(r[0]))
    if len(expected) != len(r):
        raise AssertionError(f"column count: expected {len(expected)}, got {len(r)}")
    for i, (a, c) in enumerate(zip(expected, r)):
        if str(a) != str(c):
            raise AssertionError(f"column {i} ({HEADER[i]}): expected {a!r}, got {c!r}")


def dataframe(spark, n: int):
    """The fixture as a DataFrame of all-string columns plus the int
    seed — matching the reference's untyped wire format where every
    value is a string until a format boundary types it."""
    data = [tuple(str(v) for v in r) for r in rows(n)]
    return spark.createDataFrame(data, schema=list(HEADER))


def csv_lines(n: int) -> list[str]:
    """Unquoted CSV, header first (reference TestRow::csv)."""
    out = [",".join(HEADER)]
    out += [",".join(str(v) for v in r) for r in rows(n)]
    return out


def ndjson_lines(n: int) -> list[str]:
    """One all-strings JSON object per line (reference TestRow::ndjson)."""
    out = []
    for r in rows(n):
        pairs = ",".join(f'"{h}":"{v}"' for h, v in zip(HEADER, r))
        out.append("{" + pairs + "}")
    return out


def json_doc(n: int) -> str:
    """Single JSON array document (reference TestRow::json)."""
    return "[" + ",".join(ndjson_lines(n)) + "]"
