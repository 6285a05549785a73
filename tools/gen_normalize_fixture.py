from encodings import normalize_encoding
ranges = [(0x0870, 0x0887), (0x0889, 0x088e), (0x08b5, 0x08b5), (0x08c8, 0x08c9),
          (0x0c5d, 0x0c5d), (0x0cdd, 0x0cdd), (0x170d, 0x170d), (0x171f, 0x171f),
          (0x1b4c, 0x1b4c), (0x2c2f, 0x2c2f), (0x2c5f, 0x2c5f), (0x9ffd, 0x9fff),
          (0xa7c0, 0xa7c1), (0xa7d0, 0xa7d1), (0xa7d3, 0xa7d3), (0xa7d5, 0xa7d9),
          (0xa7f2, 0xa7f4)]
names = []
for a, b in ranges:
    for cp in range(a, b + 1):
        c = chr(cp)
        names.append(f"utf{c}8")      # alnum-skip: expect 'utf8'
        names.append(f"utf-{c}-8")    # punct around: expect 'utf_8'
names += ["latin-1", "UTF_8", "macintosh", "ISO 8859-1", "latiné1",
          "a é b", "  x  ", "--y--", "u.t.f-8", "³x", "Ⅻy",
          "..a..b..", "Café-8", "ŉ-1", "ﬁ8", "İstanbul-9",
          "utf8", "8–bit", "x²y¾z"]
with open('/root/repo/src/test/resources/goldens/normalize_cases.tsv', 'w') as f:
    for n in names:
        exp = normalize_encoding(n.lower())
        assert '\t' not in n and '\n' not in n
        f.write(f"{n}\t{exp}\n")
print(len(names), 'cases')
