# Generates the Java-vs-RE2 parity fixture for the t7 PII patterns:
# adversarial strings full of near-miss PII shapes, with expected
# match counts and the md5 of the redacted string computed by DuckDB
# (RE2 — the oracle engine). PiiParitySpec re-derives both with Java
# regex (the Spark engine's semantics) and asserts equality, pinning
# the claim in TextOps that the patterns scan identically in both
# engines on inputs far nastier than the enrichment ever produces.
import duckdb, hashlib, os, random

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "src", "test", "resources", "goldens", "pii_cases.tsv")

EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE = r"\+[0-9][0-9-]{6,}[0-9]"
IP = r"([0-9]{1,3}\.){3}[0-9]{1,3}"

rng = random.Random(20260818)
ATOMS = [
    "a", "bob", "x.y", "_", "%", "+", "-", "--", "@", "@@", ".", "..",
    "0", "7", "12", "345", "9999", "12345678", "+1", "+12-34-56-78",
    "+1-555-", "-555-0042", "1.2.3.4", "1.2.3.4.5", "256.300.1.2",
    "10.0.0.", ".0.0.1", "a@b.co", "a@b.c", "a@b", "@b.co", "user@",
    "u@-.co", "u@.co", "MiXeD@CaSe.Org", "café@latté.fr", " ",
    "  ", "\t", "+", "++", "+-+-+-+-+", "0-0-0-0-0", "e.g.", "v1.2.3",
]
cases = []
for _ in range(5000):
    n = rng.randint(1, 12)
    s = "".join(rng.choice(ATOMS) for _ in range(n))
    if "\t" in s:
        s = s.replace("\t", " ")
    cases.append(s)
# a few hand-picked boundary shapes
cases += [
    "user12345678@src.example.com",          # digits inside an email local part
    "call +1-555-0042-013 now",
    "ip 10.3.22.14 and 999.999.999.999",
    "+12345678@x.co",                        # + phone prefix inside a local part
    "a@b.c@d.ee",                            # stacked @
    "1.2.3.4@5.6.7.8.co",
    "+1-2-3-4-5-6-7-8-9",
    "",
]

con = duckdb.connect()
out = []
for s in cases:
    r = con.execute(
        """SELECT len(regexp_extract_all(?, ?)),
                  len(regexp_extract_all(?, ?)),
                  len(regexp_extract_all(?, ?)),
                  regexp_replace(regexp_replace(regexp_replace(?,
                    ?, '<EMAIL>', 'g'), ?, '<PHONE>', 'g'), ?, '<IP>', 'g')""",
        [s, EMAIL, s, PHONE, s, IP, s, EMAIL, PHONE, IP]).fetchone()
    ne, np_, ni, clean = r
    out.append((s, ne, np_, ni, hashlib.md5(clean.encode()).hexdigest()))

with open(OUT, "w", encoding="utf-8") as f:
    for s, ne, np_, ni, h in out:
        assert "\t" not in s and "\n" not in s
        f.write(f"{s}\t{ne}\t{np_}\t{ni}\t{h}\n")
nonzero = sum(1 for r in out if r[1] + r[2] + r[3] > 0)
print(len(out), "cases,", nonzero, "with at least one match")
