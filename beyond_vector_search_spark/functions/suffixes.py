"""Bundled multi-label public-suffix table for registered-domain
extraction.

Per-registered-domain grouping is how web-corpus pipelines apply
quality priors, crawl budgets, and blocklists; the naive last-two-labels
heuristic merges every ``co.uk``-style registry into one bucket
(``bbc.co.uk`` and ``guardian.co.uk`` would both become ``co.uk`` — one
budget bucket for the whole UK web).  The fix is DATA, not code: a
table of suffixes under which registrations happen one label deeper.

``MULTI_LABEL_SUFFIXES`` is a hand-curated subset of the well-known
public-suffix list format (publicsuffix.org — public knowledge): the
common ccTLD second-level registries (ICANN section) in
``ICANN_SUFFIXES``, plus a small set of high-traffic hosting platforms
whose subdomains are independent sites (the list's "private" section:
``github.io`` pages, ``blogspot.com`` blogs, ...) in
``PRIVATE_SUFFIXES``.  It is deliberately NOT the full ~10k-entry list:
entries here are 2-label only, wildcard rules (``*.ck``) and deeper
registries (``pref.aichi.jp``) are out of scope, and coverage follows
crawl-corpus frequency, not completeness.  Deployments tracking the
full upstream list should load it as a table and use the broadcast-join
form (:func:`~beyond_vector_search_spark.operators.text_analysis.
registered_domains`) — same semantics, data swapped at runtime.

Scale shape: the bundled table folds into the domain EXPRESSION as a
static membership test (Catalyst compiles a large ``isin`` to an
``InSet`` hash probe inside whole-stage codegen), so
:func:`~beyond_vector_search_spark.operators.text_analysis.url_parts`
stays a pure narrow map — zero exchanges, no broadcast to build or
ship per query.  That is the right trade for a few hundred static
entries; the broadcast join wins only when the table is large or
refreshed without redeploying.
"""

from __future__ import annotations

ICANN_SUFFIXES: tuple[str, ...] = (
    # United Kingdom
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "sch.uk",
    # Australia / New Zealand
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "kiwi.nz",
    "maori.nz", "net.nz", "org.nz", "school.nz",
    # Japan / Korea / Taiwan / Hong Kong / Singapore / Malaysia
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr",
    "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr",
    "club.tw", "com.tw", "ebiz.tw", "edu.tw", "game.tw", "gov.tw",
    "idv.tw", "mil.tw", "net.tw", "org.tw",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    "com.my", "edu.my", "gov.my", "mil.my", "name.my", "net.my", "org.my",
    # China / India / Indonesia / Thailand / Vietnam / Philippines
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "mil.in", "net.in", "nic.in", "org.in", "res.in",
    "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
    "net.id", "or.id", "sch.id", "web.id",
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "ac.vn", "biz.vn", "com.vn", "edu.vn", "gov.vn", "health.vn",
    "info.vn", "int.vn", "name.vn", "net.vn", "org.vn", "pro.vn",
    "com.ph", "edu.ph", "gov.ph", "i.ph", "mil.ph", "net.ph", "ngo.ph",
    "org.ph",
    # South Asia
    "biz.pk", "com.pk", "edu.pk", "fam.pk", "gov.pk", "net.pk", "org.pk",
    "web.pk",
    "ac.bd", "com.bd", "edu.bd", "gov.bd", "mil.bd", "net.bd", "org.bd",
    "ac.lk", "com.lk", "edu.lk", "gov.lk", "net.lk", "org.lk", "sch.lk",
    "biz.np", "com.np", "edu.np", "gov.np", "info.np", "mil.np",
    "name.np", "net.np", "org.np",
    # Middle East / Central Asia
    "ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il", "net.il",
    "org.il",
    "ac.ir", "co.ir", "gov.ir", "id.ir", "net.ir", "org.ir", "sch.ir",
    "com.iq", "edu.iq", "gov.iq", "mil.iq", "net.iq", "org.iq",
    "com.jo", "edu.jo", "gov.jo", "mil.jo", "name.jo", "net.jo",
    "org.jo", "sch.jo",
    "com.lb", "edu.lb", "gov.lb", "net.lb", "org.lb",
    "com.kw", "edu.kw", "emb.kw", "gov.kw", "ind.kw", "net.kw", "org.kw",
    "com.qa", "edu.qa", "gov.qa", "mil.qa", "name.qa", "net.qa",
    "org.qa", "sch.qa",
    "co.om", "com.om", "edu.om", "gov.om", "med.om", "net.om", "org.om",
    "pro.om",
    "com.bh", "edu.bh", "gov.bh", "net.bh", "org.bh",
    "com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa", "pub.sa",
    "sch.sa",
    "ac.ae", "co.ae", "gov.ae", "mil.ae", "net.ae", "org.ae", "sch.ae",
    "com.tr", "edu.tr", "gen.tr", "gov.tr", "k12.tr", "mil.tr",
    "name.tr", "net.tr", "org.tr", "web.tr",
    "com.kz", "edu.kz", "gov.kz", "mil.kz", "net.kz", "org.kz",
    "co.uz", "com.uz", "net.uz", "org.uz",
    "com.ge", "edu.ge", "gov.ge", "mil.ge", "net.ge", "org.ge", "pvt.ge",
    "co.am", "com.am", "net.am", "org.am",
    "biz.az", "com.az", "edu.az", "gov.az", "info.az", "int.az",
    "mil.az", "name.az", "net.az", "org.az", "pp.az", "pro.az",
    "com.by", "gov.by", "mil.by", "of.by",
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    "com.ru", "net.ru", "org.ru", "pp.ru",
    # Africa
    "ac.za", "co.za", "edu.za", "gov.za", "mil.za", "net.za", "nom.za",
    "org.za", "web.za",
    "com.ng", "edu.ng", "gov.ng", "i.ng", "mil.ng", "mobi.ng", "name.ng",
    "net.ng", "org.ng", "sch.ng",
    "ac.ke", "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke", "ne.ke",
    "or.ke", "sc.ke",
    "com.gh", "edu.gh", "gov.gh", "mil.gh", "org.gh",
    "ac.tz", "co.tz", "go.tz", "info.tz", "me.tz", "mil.tz", "mobi.tz",
    "ne.tz", "or.tz", "sc.tz", "tv.tz",
    "ac.ug", "co.ug", "com.ug", "go.ug", "ne.ug", "or.ug", "org.ug",
    "sc.ug",
    "ac.zm", "biz.zm", "co.zm", "com.zm", "edu.zm", "gov.zm", "info.zm",
    "mil.zm", "net.zm", "org.zm", "sch.zm",
    "ac.zw", "co.zw", "gov.zw", "mil.zw", "org.zw",
    "ac.ma", "co.ma", "gov.ma", "net.ma", "org.ma", "press.ma",
    "com.tn", "gov.tn", "ind.tn", "net.tn", "org.tn",
    "art.dz", "asso.dz", "com.dz", "edu.dz", "gov.dz", "net.dz",
    "org.dz", "pol.dz",
    "com.ly", "edu.ly", "gov.ly", "id.ly", "med.ly", "net.ly", "org.ly",
    "plc.ly", "sch.ly",
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg",
    "net.eg", "org.eg", "sci.eg",
    "com.et", "biz.et", "edu.et", "gov.et", "info.et", "name.et",
    "net.et", "org.et",
    "art.sn", "com.sn", "edu.sn", "gouv.sn", "org.sn", "perso.sn",
    "univ.sn",
    # Americas
    "ab.ca", "bc.ca", "gc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca",
    "ns.ca", "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca",
    "yk.ca",
    "art.br", "blog.br", "com.br", "eco.br", "edu.br", "emp.br",
    "gov.br", "inf.br", "mil.br", "net.br", "org.br", "rec.br",
    "srv.br", "tv.br",
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    "com.ar", "edu.ar", "gob.ar", "int.ar", "mil.ar", "net.ar",
    "org.ar", "tur.ar",
    "arts.co", "com.co", "edu.co", "firm.co", "gov.co", "info.co",
    "int.co", "mil.co", "net.co", "nom.co", "org.co", "rec.co", "web.co",
    "gob.cl", "gov.cl",
    "com.pe", "edu.pe", "gob.pe", "mil.pe", "net.pe", "nom.pe", "org.pe",
    "co.ve", "com.ve", "edu.ve", "gob.ve", "info.ve", "mil.ve",
    "net.ve", "org.ve", "web.ve",
    "com.ec", "edu.ec", "fin.ec", "gob.ec", "gov.ec", "info.ec",
    "med.ec", "mil.ec", "net.ec", "org.ec", "pro.ec",
    "com.uy", "edu.uy", "gub.uy", "mil.uy", "net.uy", "org.uy",
    "com.bo", "edu.bo", "gob.bo", "gov.bo", "int.bo", "mil.bo",
    "net.bo", "org.bo", "tv.bo", "web.bo",
    "com.py", "coop.py", "edu.py", "gov.py", "mil.py", "net.py",
    "org.py",
    "ac.cr", "co.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
    "abo.pa", "ac.pa", "com.pa", "edu.pa", "gob.pa", "ing.pa", "med.pa",
    "net.pa", "nom.pa", "org.pa", "sld.pa",
    "art.do", "com.do", "edu.do", "gob.do", "gov.do", "mil.do",
    "net.do", "org.do", "sld.do", "web.do",
    "com.gt", "edu.gt", "gob.gt", "ind.gt", "mil.gt", "net.gt", "org.gt",
    "ac.ni", "biz.ni", "co.ni", "com.ni", "edu.ni", "gob.ni", "info.ni",
    "int.ni", "mil.ni", "net.ni", "nom.ni", "org.ni", "web.ni",
    "com.hn", "edu.hn", "gob.hn", "mil.hn", "net.hn", "org.hn",
    "com.sv", "edu.sv", "gob.sv", "org.sv", "red.sv",
    "com.cu", "edu.cu", "gov.cu", "inf.cu", "net.cu", "org.cu",
    # Europe (ccTLDs with active second-level registries)
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    "ac.at", "co.at", "gv.at", "or.at",
    "ac.be",
    "edu.it", "gov.it",
    "com.es", "edu.es", "gob.es", "nom.es", "org.es",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt",
    "org.pt", "publ.pt",
    "com.gr", "edu.gr", "gov.gr", "net.gr", "org.gr",
    "arts.ro", "com.ro", "firm.ro", "info.ro", "nom.ro", "nt.ro",
    "org.ro", "rec.ro", "store.ro", "tm.ro", "www.ro",
    "co.hu", "info.hu", "org.hu", "priv.hu",
    "biz.pl", "com.pl", "edu.pl", "gov.pl", "info.pl", "mil.pl",
    "net.pl", "org.pl", "waw.pl",
    "org.se", "pp.se", "tm.se",
    "gov.ie",
    "com.is", "edu.is", "gov.is", "int.is", "net.is", "org.is",
    "gov.lt",
    "asn.lv", "com.lv", "conf.lv", "edu.lv", "gov.lv", "id.lv",
    "mil.lv", "net.lv", "org.lv",
    "aip.ee", "com.ee", "edu.ee", "fie.ee", "gov.ee", "lib.ee",
    "med.ee", "org.ee", "pri.ee", "riik.ee",
    "ac.rs", "co.rs", "edu.rs", "gov.rs", "in.rs", "org.rs",
    "com.hr",
)

# Hosting platforms whose subdomains are independently operated sites
# (the public-suffix list's "private" section): for crawl budgets and
# dedup, alice.github.io and bob.github.io are different publishers.
PRIVATE_SUFFIXES: tuple[str, ...] = (
    "appspot.com", "azurewebsites.net", "blogspot.com", "cloudfront.net",
    "firebaseapp.com", "github.io", "gitlab.io", "herokuapp.com",
    "neocities.org", "netlify.app", "pages.dev", "readthedocs.io",
    "tumblr.com", "vercel.app", "web.app", "weebly.com", "wixsite.com",
    "wordpress.com", "workers.dev",
)

MULTI_LABEL_SUFFIXES: tuple[str, ...] = tuple(
    sorted(set(ICANN_SUFFIXES) | set(PRIVATE_SUFFIXES))
)
