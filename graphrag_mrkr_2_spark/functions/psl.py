"""Public-suffix handling for registered-domain extraction (VERDICT r3
'Next round' #7).

``PSL_RULES`` vendors a curated subset (~600 rules) of the Public Suffix
List (publicsuffix.org — public data, Mozilla-maintained, MPL-2.0) in the
list's own syntax: ``co.uk`` (normal rule), ``*.ck`` (wildcard rule),
``!www.ck`` (exception rule). The subset covers the high-traffic ccTLD
second-level registries (uk/au/jp/br/cn/in/... families), US/CA regional
suffixes, and the hosting-platform private suffixes that dominate web
crawls (github.io, blogspot.com, amazonaws.com wildcards, ...).

The FULL list is an injectable data seam, same category as the BPE ranks
file: point ``SPARK_GRAFT_PSL_FILE`` at a downloaded
``public_suffix_list.dat`` and :func:`load_rules` parses it (comment/
blank-line stripping per the PSL format spec).

:func:`registered_domain_expr` compiles the rules into a pure Spark column
expression — chained ``substring_index`` membership tests against literal
sets (Catalyst turns large ``isin`` literals into hashed ``InSet``; whole-
stage codegen, no Python, no join) — implementing the PSL algorithm:
exception rules beat all, else the longest matching rule wins (a wildcard
``*.base`` counts one label longer than its base), else the implicit ``*``
rule (the bare TLD). A host that IS a public suffix falls back to itself so
per-domain caps always have a grouping key.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# vendored subset of the Public Suffix List (publicsuffix.org, MPL-2.0)
# --------------------------------------------------------------------------

def _family(cc: str, labels: str) -> list[str]:
    return [f"{x}.{cc}" for x in labels.split()]


_ICANN: list[str] = []
_ICANN += _family("uk", "ac co gov ltd me net nhs org plc police")
_ICANN += ["*.sch.uk"]
_ICANN += _family("au", "com net org edu gov asn id act nsw nt qld sa tas vic wa")
_ICANN += _family("jp", "ac ad co ed go gr lg ne or")
_ICANN += _family("nz", "ac co cri geek gen govt health iwi kiwi maori mil net org parliament school")
_ICANN += _family("za", "ac co edu gov law mil net ngo nom org school web")
_ICANN += _family(
    "br",
    "adv agr am arq art bio blog cim cng cnt com coop ecn eco edu emp eng esp etc "
    "eti far flog fm fnd fot g12 ggf gov imb ind inf jor jus leg lel mat med mil "
    "mus net nom not ntr odo org ppg pro psc psi qsl radio rec slg srv taxi teo "
    "tmp trd tur tv vet vlog wiki zlg",
)
_ICANN += _family("in", "ac co edu firm gen gov ind mil net nic org res")
_ICANN += _family(
    "cn",
    "ac com edu gov mil net org ah bj cq fj gd gs gx gz ha hb he hi hl hn jl js "
    "jx ln nm nx qh sc sd sh sn sx tj xj xz yn zj",
)
_ICANN += _family("kr", "ac co es go hs kg mil ms ne or pe re sc seoul busan daegu incheon gwangju daejeon ulsan gyeonggi gangwon chungbuk chungnam jeonbuk jeonnam gyeongbuk gyeongnam jeju")
_ICANN += _family("tw", "com net org edu gov mil idv club ebiz game")
_ICANN += _family("hk", "com edu gov idv net org")
_ICANN += _family("sg", "com edu gov net org per")
_ICANN += _family("mx", "com net org edu gob")
_ICANN += _family("ar", "com edu gob gov int mil musica net org tur")
_ICANN += _family("tr", "av bbs bel biz com dr edu gen gov info k12 name net org pol tel tv web")
_ICANN += _family("il", "ac co gov idf k12 muni net org")
_ICANN += _family("id", "ac biz co desa go mil my net or ponpes sch web")
_ICANN += _family("th", "ac co go in mi net or")
_ICANN += _family("my", "com edu gov mil name net org")
_ICANN += _family("ph", "com edu gov i mil net ngo org")
_ICANN += _family("pk", "biz com edu fam gob gok gon gop gos gov net org web")
_ICANN += _family("sa", "com edu gov med net org pub sch")
_ICANN += _family("ae", "ac co gov mil net org sch")
_ICANN += _family("eg", "com edu eun gov mil name net org sci")
_ICANN += _family("ng", "com edu gov i mil mobi name net org sch")
_ICANN += _family("ke", "ac co go info me mobi ne or sc")
_ICANN += _family("ua", "com edu gov in net org cherkassy chernigov crimea dn dp kharkov kherson kiev kirovograd km kr lugansk lutsk lviv nikolaev odessa poltava rovno sebastopol sumy ternopil uzhgorod vinnica zaporizhzhe zhitomir")
_ICANN += _family(
    "pl",
    "agro aid atm auto biz com edu gmina gov gsm info mail miasta media mil "
    "nieruchomosci nom pc powiat priv realestate rel shop sklep sos szkola targi "
    "tm tourism travel turystyka waw warszawa wroc krakow katowice poznan lodz "
    "gda gdansk slupsk szczecin lublin bialystok olsztyn torun",
)
_ICANN += _family("fr", "aeroport asso avocat avoues cci chambagri chirurgiens-dentistes com experts-comptables geometre-expert gouv greta huissier-justice medecin nom notaires pharmacien port prd tm veterinaire")
_ICANN += _family("es", "com edu gob nom org")
_ICANN += _family("pt", "com edu gov int net nome org publ")
_ICANN += _family("gr", "com edu gov net org")
_ICANN += _family("ro", "arts com firm info nom nt org rec store tm www")
_ICANN += _family("ca", "ab bc gc mb nb nf nl ns nt nu on pe qc sk yk")
_US_STATES = (
    "ak al ar az ca co ct dc de fl ga hi ia id il in ks ky la ma md me mi mn mo "
    "ms mt nc nd ne nh nj nm nv ny oh ok or pa ri sc sd tn tx ut va vt wa wi wv wy"
)
_ICANN += _family("us", _US_STATES + " dni fed isa kids nsn")
# k12 networks inside states (3-label suffixes, a representative slice)
_ICANN += [f"k12.{s}.us" for s in "ca ny tx fl il pa oh mi wa va".split()]
_ICANN += [f"cc.{s}.us" for s in "ca ny tx fl".split()]
# wildcard ccTLDs (every 2nd-level name is a registry)
_ICANN += ["*.ck", "*.bd", "*.er", "*.fk", "*.jm", "*.kh", "*.mm", "*.np", "*.pg"]
_ICANN += ["!www.ck"]

# private-section suffixes that dominate web crawls
_PRIVATE = [
    "github.io", "githubusercontent.com", "gitlab.io", "bitbucket.io",
    "blogspot.com", "wordpress.com", "wixsite.com", "appspot.com",
    "web.app", "firebaseapp.com", "herokuapp.com", "netlify.app",
    "vercel.app", "pages.dev", "workers.dev", "cloudfront.net",
    "azurewebsites.net", "cloudapp.net", "s3.amazonaws.com",
    "elasticbeanstalk.com", "readthedocs.io", "neocities.org", "surge.sh",
    "onrender.com", "fly.dev", "glitch.me", "repl.co",
    "*.compute.amazonaws.com", "*.compute-1.amazonaws.com",
]

PSL_RULES: tuple[str, ...] = tuple(_ICANN + _PRIVATE)


@lru_cache(maxsize=8)
def _load_rules_file(path: str, mtime: float) -> tuple[str, ...]:
    """Parse a public_suffix_list.dat once per (path, mtime) — every plan
    construction would otherwise re-read and re-parse the ~240 KB file
    (review r4 finding #9); mtime in the key keeps edits visible."""
    rules = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("//"):
                continue
            rules.append(line.split()[0])
    return tuple(rules)


def load_rules() -> tuple[str, ...]:
    """The active rule set: the full PSL file named by SPARK_GRAFT_PSL_FILE
    when present (data seam), else the vendored subset."""
    path = os.environ.get("SPARK_GRAFT_PSL_FILE")
    if path and os.path.exists(path):
        return _load_rules_file(path, os.path.getmtime(path))
    return PSL_RULES


def _partition_rules(rules: tuple[str, ...]):
    """Split rules into {label_count: set} maps for normal / wildcard /
    exception rules. Wildcards are keyed by their BASE label count."""
    normal: dict[int, set[str]] = {}
    wild: dict[int, set[str]] = {}
    exc: dict[int, set[str]] = {}
    for r in rules:
        r = r.lower()
        if r.startswith("!"):
            s = r[1:]
            exc.setdefault(s.count(".") + 1, set()).add(s)
        elif r.startswith("*."):
            s = r[2:]
            wild.setdefault(s.count(".") + 1, set()).add(s)
        else:
            n = r.count(".") + 1
            if n >= 2:  # 1-label normal rules equal the implicit '*' default
                normal.setdefault(n, set()).add(r)
    return normal, wild, exc


@lru_cache(maxsize=4)
def _compiled(rules: tuple[str, ...]):
    return _partition_rules(rules)


def registered_domain_expr(host: Column, rules: tuple[str, ...] | None = None) -> Column:
    """Registered (PSL-aware) domain of a lowercase host column.

    Implements the PSL match algorithm as a priority when-chain over
    ``substring_index`` suffix probes: exceptions first, then candidate
    public-suffix lengths longest-first (wildcard base k ⇒ suffix k+1
    labels; normal rule k ⇒ suffix k labels), default suffix = the TLD.
    Registered domain = public suffix + one label; a host that is itself a
    public suffix (or a single label) returns unchanged.
    """
    normal, wild, exc = _compiled(rules if rules is not None else load_rules())
    nl = F.size(F.split(host, r"\."))
    # IP literals have no registrable boundary — the implicit '*' rule would
    # truncate 104.16.2.8 to '2.8' and merge unrelated servers into one cap
    # group (review r4 finding #3; real PSL libraries special-case these).
    # IPv4 = four dotted decimal octets; IPv6 arrives bracketed from the
    # URL host capture (urlops._HOST keeps [..] whole) or bare with ':'.
    is_ip = (
        host.rlike(r"^[0-9]{1,3}(\.[0-9]{1,3}){3}$")
        | host.contains(":")
        | host.startswith("[")
    )

    def last(k: int) -> Column:
        return F.substring_index(host, ".", -k)

    # candidates as (priority_ps_len, condition) — build longest-first
    branches: list[tuple[Column, Column]] = []
    for m in sorted(exc, reverse=True):
        cond = (nl >= m) & last(m).isin(*sorted(exc[m]))
        branches.append((cond, last(m)))  # ps = m-1 ⇒ registered = last m
    ps_lens = sorted(
        {k + 1 for k in wild} | set(normal), reverse=True
    )
    for ps in ps_lens:
        conds = []
        if ps in normal:
            conds.append((nl >= ps) & last(ps).isin(*sorted(normal[ps])))
        if ps - 1 in wild:
            conds.append((nl >= ps) & last(ps - 1).isin(*sorted(wild[ps - 1])))
        cond = conds[0]
        for c in conds[1:]:
            cond = cond | c
        value = F.when(nl >= ps + 1, last(ps + 1)).otherwise(host)
        branches.append((cond, value))

    out = F.when(nl >= 2, last(2)).otherwise(host)  # implicit '*' rule
    for cond, value in reversed(branches):
        out = F.when(cond, value).otherwise(out)
    return F.when(is_ip, host).otherwise(out)
