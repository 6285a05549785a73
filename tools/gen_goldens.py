#!/usr/bin/env python3
"""One-time documented golden harness (FIXTURES.md §5).

Runs the REFERENCE parser modules at /root/reference over the deterministic
corpus written by `graft.corpus.GenMain`, producing the golden span
sequences our Spark engine must equal per-row:

  - SF=0.001: full span JSON  -> src/test/resources/goldens/sf0.001.json
  - any SF:   per-doc digests -> data/goldens/sf{SF}.hashes.jsonl
              (sha256 over "kind\\0text\\0media_ref\\0order" joined "\\x1e",
               matching graft.parse.DocParser.spanHash)

Reference code is EXECUTED (not copied): html strip + sectionize via
TextExtractor, email via email.message_from_bytes + EmailExtractor, rules
via RulesEngine on the real global_rules.yml plus a temp signature_overrides
dir holding the broadcast table's override rules, signature tokens/jaccard
via SignatureManager. The stateful store + LLM layers are replaced by the
deterministic canonical-table match, mirroring graft.parse.SignatureTable
(the north-rule substitution, SURVEY §1.1/§2.5). pdfplumber is stubbed: the
corpus supplies per-page text, exactly what pdf_extractor.py:35-48 consumes.

Usage: python3 tools/gen_goldens.py <corpusDir> <sfLabel>
e.g.   python3 tools/gen_goldens.py data/docs/sf0.001 0.001
"""
import sys, os, json, types, hashlib, tempfile

sys.modules['pdfplumber'] = types.ModuleType('pdfplumber')  # absent offline
sys.path.insert(0, '/root/reference')

import pyarrow.parquet as pq
from src.normalization.extractors.text_extractor import TextExtractor
from src.normalization.extractors.email_extractor import EmailExtractor
from src.normalization.rules_engine import RulesEngine
from src.normalization.signatures import SignatureManager
from src.normalization.schema import Section

SAME_VERSION = 0.90
NEW_VERSION = 0.70
PAGE_W, PAGE_H = 612.0, 792.0

# --- canonical signature table: mirror of graft.parse.SignatureTable -------
def text_element(content):
    return {'content': content, 'type': 'text', 'bbox': (0, 0, PAGE_W, PAGE_H),
            'page': 1, 'page_width': PAGE_W, 'page_height': PAGE_H}

def words(n):
    return ' '.join('w%d' % i for i in range(1, n + 1))

EMAIL_HEADER_REPS = [
    'From: sender@example.com',
    'To: recipient@example.com',
    'Subject: Invoice INV-0',
    'Date: Mon, 1 Jan 2024 10:00:00 +0000',
]

def email_header_elements():
    els = []
    for i, c in enumerate(EMAIL_HEADER_REPS):
        els.append({'content': c, 'type': 'header',
                    'bbox': (10, i * 25, 790, i * 25 + 20),
                    'page': 1, 'page_width': 800.0, 'page_height': 600.0})
    return els

class Canonical:
    def __init__(self, tokens, cached_fields, has_overrides):
        self.tokens = tokens
        self.cached_fields = cached_fields  # list of (key, value)
        self.has_overrides = has_overrides
        self.signature_id = sig_id(tokens)

def sig_id(tokens):
    from dataclasses import asdict
    s = json.dumps([asdict(t) for t in tokens], sort_keys=True)
    return hashlib.sha1(s.encode()).hexdigest()[:12]

OVERRIDE_RULES_YML = """rules:
  - field_name: "gstin"
    pattern: "GSTIN\\\\s*:?\\\\s*([0-9A-Z]{15})"
    confidence: 0.85
  - field_name: "po_number"
    pattern: "(?:PO|P\\\\.O\\\\.)\\\\s*(?:number|no\\\\.?)?\\\\s*:?\\\\s*([A-Z0-9-]+)"
    confidence: 0.75
"""
EMAIL_OVERRIDE_YML = """rules:
  - field_name: "reply_to"
    pattern: "Reply-To\\\\s*:?\\\\s*([a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+)"
    confidence: 0.8
"""

def main():
    corpus_dir, sf = sys.argv[1], sys.argv[2]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    tmp_rules = tempfile.mkdtemp(prefix='graft_rules_')
    ov_dir = os.path.join(tmp_rules, 'signature_overrides')
    os.makedirs(ov_dir)
    with open('/root/reference/rules/global_rules.yml') as f:
        g = f.read()
    with open(os.path.join(tmp_rules, 'global_rules.yml'), 'w') as f:
        f.write(g)
    tmp_sig = tempfile.mkdtemp(prefix='graft_sigs_')
    sm = SignatureManager(tmp_sig)

    cache_fam = Canonical(sm._generate_tokens([text_element(words(14))]),
                          [('form_type', 'routing_slip'),
                           ('department', 'archives'),
                           ('priority', 'standard')], False)
    override_fam = Canonical(sm._generate_tokens([text_element(words(20))]),
                             [], True)
    email_fam = Canonical(sm._generate_tokens(email_header_elements()),
                          [], True)
    table = [cache_fam, override_fam, email_fam]
    with open(os.path.join(ov_dir, override_fam.signature_id + '.yml'), 'w') as f:
        f.write(OVERRIDE_RULES_YML)
    with open(os.path.join(ov_dir, email_fam.signature_id + '.yml'), 'w') as f:
        f.write(EMAIL_OVERRIDE_YML)

    engine = RulesEngine(tmp_rules)
    text_ex = TextExtractor()
    email_ex = EmailExtractor()

    def match_signature(tokens):
        best, best_sim = None, 0.0
        for c in table:
            s = sm._calculate_jaccard_similarity(tokens, c.tokens)
            if s > best_sim:
                best_sim, best = s, c
        if best is not None and best_sim >= SAME_VERSION:
            return best.signature_id, best_sim, best
        if best is not None and best_sim >= NEW_VERSION:
            return best.signature_id, best_sim, best
        return sig_id(tokens), 1.0, None

    def parse_doc(doc_id, spans):
        spans = sorted(spans, key=lambda s: s['offset'])
        media = [s for s in spans if s['kind'] == 'media']
        content = [s for s in spans if s['kind'] != 'media']
        kinds = sorted(set(s['kind'] for s in content))

        sections = []  # list of (anchor_offset, Section)
        if kinds == ['html'] or kinds == ['text']:
            span = content[0]
            text = (text_ex._strip_html_tags(span['text'])
                    if kinds == ['html'] else span['text'])
            full_text = text
            elements = [text_element(text)]
            secs = text_ex.convert_to_sections(elements)
            sections = [(span['offset'], s) for s in secs]
        elif kinds == ['email']:
            span = content[0]
            import email as email_mod
            msg = email_mod.message_from_bytes(span['text'].encode('utf-8'))
            headers = email_ex._extract_headers(msg)
            body = email_ex._extract_body(msg)
            full_text = email_ex._create_full_text(headers, body)
            elements = email_ex._create_layout_elements(headers, body)
            secs = email_ex.convert_to_sections(elements)
            sections = [(span['offset'], s) for s in secs]
        elif kinds == ['pdf_page']:
            # pdf_extractor.py:27-54 assembly over supplied page texts
            full_text = ''
            elements = []
            for page_num, ps in enumerate(content, 1):
                page_text = ps['text']
                full_text += page_text + '\n'
                if page_text.strip():
                    el = {'content': page_text.strip(), 'type': 'text',
                          'bbox': (0, 0, PAGE_W, PAGE_H), 'page': page_num,
                          'page_width': PAGE_W, 'page_height': PAGE_H}
                    elements.append(el)
                    sections.append((ps['offset'],
                                     Section(title='Page %d' % page_num,
                                             content=page_text.strip(), level=1,
                                             bbox=_bb(el))))
        else:
            return None  # error channel — excluded from goldens

        tokens = sm._generate_tokens(elements)
        sid, sim, matched = match_signature(tokens)
        event = ('new_family' if matched is None
                 else 'same_version' if sim >= SAME_VERSION
                 else 'new_version')

        if sim >= SAME_VERSION and matched is not None and matched.cached_fields:
            kvs = [(k, v, 'cache') for k, v in matched.cached_fields]
        else:
            extracted, _ = engine.apply_rules(full_text, sid)
            kvs = [(kv.key, str(kv.value), 'rule') for kv in extracted]

        paragraphs = [p.strip() for p in full_text.split('\n\n') if p.strip()]
        chunks = [(p, '%s_chunk_%03d' % (doc_id, i))
                  for i, p in enumerate(paragraphs)]

        out = []
        events = []
        for s in media:
            events.append(((s['offset'], 0), ['media', '', s['media_ref']]))
        for i, (anchor, sec) in enumerate(sections):
            ref = 'page:%d' % sec.bbox.page if sec.bbox else ''
            events.append(((anchor, i),
                           ['section', sec.title + '\n' + sec.content, ref]))
        for _, sp in sorted(events, key=lambda e: e[0]):
            out.append(sp)
        for k, v, method in kvs:
            out.append(['kv', '%s=%s' % (k, v), method])
        for c, cid in chunks:
            out.append(['chunk', c, cid])
        return ([[sp[0], sp[1], sp[2], i] for i, sp in enumerate(out)],
                sid, sim, event)

    def _bb(el):
        from src.normalization.schema import BoundingBox
        return BoundingBox(x1=el['bbox'][0], y1=el['bbox'][1],
                           x2=el['bbox'][2], y2=el['bbox'][3],
                           page=el.get('page', 1))

    def span_hash(spans):
        payload = '\x1e'.join('%s\0%s\0%s\0%d' % (k, t, r, o)
                              for k, t, r, o in spans)
        return hashlib.sha256(payload.encode('utf-8')).hexdigest()

    # Optional deterministic 1-in-K sampling (argv[3], default 1 = all):
    # keep docs where int(md5(doc_id)[:8], 16) % K == 0 — the same rule
    # GoldenSpec applies Spark-side, so corpora too large to golden in full
    # (sf1.0: 600k docs) still get an executed-reference parity gate over a
    # deterministic sample.
    sample = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    def sampled(doc_id):
        return sample <= 1 or \
            int(hashlib.md5(doc_id.encode()).hexdigest()[:8], 16) % sample == 0

    tbl = pq.read_table(os.path.join(corpus_dir))
    rows = [r for r in tbl.to_pylist() if sampled(r['doc_id'])]
    goldens, hashes, skipped = {}, [], 0
    sig_groups = {}  # (sid, event) -> [n_docs, sum_sim]
    for row in rows:
        r = parse_doc(row['doc_id'], row['spans'])
        if r is None:
            skipped += 1
            continue
        g, sid, sim, event = r
        acc = sig_groups.setdefault((sid, event), [0, 0.0])
        acc[0] += 1
        acc[1] += sim
        hashes.append((row['doc_id'], span_hash(g)))
        if sf == '0.001':
            goldens[row['doc_id']] = g

    os.makedirs(os.path.join(repo, 'src/test/resources/goldens'), exist_ok=True)
    with open(os.path.join(repo, 'src/test/resources/goldens', 'sf%s.hashes.jsonl' % sf), 'w') as f:
        for d, h in hashes:
            f.write(json.dumps({'doc_id': d, 'hash': h}) + '\n')
    if sf == '0.001':
        os.makedirs(os.path.join(repo, 'src/test/resources/goldens'), exist_ok=True)
        with open(os.path.join(repo, 'src/test/resources/goldens/sf0.001.json'), 'w') as f:
            json.dump(goldens, f, ensure_ascii=False)
        # A3 signature-statistics golden: per-(signature_id, event) doc
        # counts + mean similarity from the EXECUTED reference functions
        # (_generate_tokens / _calculate_jaccard_similarity) under the same
        # deterministic table substitution, plus the reference
        # get_signature_stats() totals shape (signatures.py:341-354).
        # ROUND_HALF_UP to match Spark's round() (Python round() banks).
        from decimal import Decimal, ROUND_HALF_UP
        def r6(x):
            return float(Decimal(repr(x)).quantize(Decimal('0.000001'),
                                                   rounding=ROUND_HALF_UP))
        groups = [
            {'signature_id': k[0], 'sig_event': k[1], 'n_docs': v[0],
             'avg_similarity': r6(v[1] / v[0])}
            for k, v in sig_groups.items()]
        total_docs = sum(v[0] for v in sig_groups.values())
        distinct_sigs = len(set(k[0] for k in sig_groups))
        stats = {
            'groups': sorted(groups,
                             key=lambda d: (d['signature_id'], d['sig_event'])),
            'total_signatures': distinct_sigs,
            'total_documents': total_docs,
            'avg_documents_per_signature':
                total_docs / distinct_sigs if distinct_sigs else 0,
        }
        with open(os.path.join(repo, 'src/test/resources/goldens/sf0.001.sigstats.json'), 'w') as f:
            json.dump(stats, f, indent=1)
    print('docs=%d skipped=%d -> goldens for sf%s' % (len(rows), skipped, sf))

if __name__ == '__main__':
    main()
