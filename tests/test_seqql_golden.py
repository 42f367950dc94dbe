"""seq-ql dialect golden corpus: `parser/seqql_filter_test.go` TestSeqQLAll
and TestSeqQLCaseSensitive verbatim. Each vector asserts the reference's
``SeqQLString()`` canonical form via :func:`seqspark.seqql.render.
seqql_string` (post-propagateNot), plus round-trip stability: parsing the
canonical form must reproduce it exactly, like the reference test does."""

import pytest

from seqspark.mapping import Mapping
from seqspark.seqql.parser import parse
from seqspark.seqql.render import seqql_string

#: the mapping of `seqql_filter_test.go:43-59`
M = Mapping(
    {
        "k8s_namespace": "keyword",
        "k8s_pod": "keyword",
        "service": "keyword",
        "level": "keyword",
        "message": "text",
        "text": "text",
        "keyword": "keyword",
        "уровень": "keyword",
        "x-forwarded-for": "keyword",
        "user-agent": "keyword",
        "#": "keyword",
        "*": "keyword",
        "m": "keyword",
        "OR": "keyword",
    }
)

VECTORS = [
    ("*", "*"),
    # propagate not
    (r"NOT NOT text:a", r"text:a"),
    (r"text:a AND NOT NOT text:b", r"(text:a and text:b)"),
    (r"text:a AND NOT text:b", r"(not text:b and text:a)"),
    (r"NOT NOT text:a OR text:b", r"(text:a or text:b)"),
    (r"NOT text:a OR text:b", r"(not (not text:b and text:a))"),
    (r"NOT (NOT text:a AND NOT text:b)", r"(text:a or text:b)"),
    (r"NOT text:a OR text:b OR text:c OR text:d",
     r"(not (not text:d and (not text:c and (not text:b and text:a))))"),
    (r"text:a OR text:b OR text:c OR NOT text:d",
     r"(not (not ((text:a or text:b) or text:c) and text:d))"),
    (r"NOT text:a AND text:b AND text:c AND text:d",
     r"(((not text:a and text:b) and text:c) and text:d)"),
    (r"text:a AND text:b AND text:c AND NOT text:d",
     r"(not text:d and ((text:a and text:b) and text:c))"),
    (r"NOT ((NOT text:a OR (NOT text:b AND text:c)) AND (NOT text:d AND NOT text:e))",
     r"((not (not text:b and text:c) and text:a) or (text:d or text:e))"),
    # fulltext search filter
    (r"service:some", r"service:some"),
    (r'service:"some text"', r'service:"some text"'),
    (r'text:"some text"', r"(text:some and text:text)"),
    (r'text:"some very long text"',
     r"(((text:some and text:very) and text:long) and text:text)"),
    (r'text:"a b" AND text:"c d f" or text:"e f"',
     r"(((text:a and text:b) and ((text:c and text:d) and text:f)) or (text:e and text:f))"),
    (r"service:some AND level:[1, 3] AND level:[3, 5]",
     r"((service:some and level:[1, 3]) and level:[3, 5])"),
    # wildcards and asterisks
    (r'service:"some*"', r"service:some*"),
    (r"service:some*", r"service:some*"),
    (r'service:"some*thing"', r"service:some*thing"),
    (r"service:some*thing", r"service:some*thing"),
    (r'service:"some*thing*"', r"service:some*thing*"),
    (r"service:some*thing*", r"service:some*thing*"),
    (r"service:*thing*", r"service:*thing*"),
    (r'service:"*"', r"service:*"),
    (r"service:*", r"service:*"),
    (r'service:"cms"*"inter"*"api"', r"service:cms*inter*api"),
    # keyword ** (allowed in seq-ql, unlike the legacy dialect)
    (r"service:**", r"service:**"),
    (r"service:a**", r"service:a**"),
    (r"service:**b", r"service:**b"),
    (r"service:a**b", r"service:a**b"),
    # tokenization
    (r"service:abc", r"service:abc"),
    (r'service:"quoted"', r"service:quoted"),
    (r'service:"quoted spaces"', r'service:"quoted spaces"'),
    ('service:\'"symbols"\'', 'service:"\\"symbols\\""'),
    (r'service:"[1 TO 3]"', r'service:"[1 to 3]"'),
    (r"  service  :   hi  ", r"service:hi"),
    (r'service:""', r'service:""'),
    # composite tokens
    ("keyword:'#''$'\"^\"", 'keyword:"#$^"'),
    ("message:'#''$'\"^\"", 'message:""'),
    ("'#':'#'", '"#":"#"'),
    ('"*":"*"', '"\\*":*'),
    ("`*`:`*`", '"\\*":"\\*"'),
    (r"m:a AND OR : r", '(m:a and "OR":r)'),
    # range filter
    (r"level:[1, 3]", r"level:[1, 3]"),
    (r"level:[*, 3]", r"level:[*, 3]"),
    (r'level:["*", 3]', r"level:[*, 3]"),
    (r'level:(1, "*"]', r"level:(1, *]"),
    (r"level:(1, *]", r"level:(1, *]"),
    (r'level:[1, 3] AND service:["*", "*"]', r"(level:[1, 3] and service:[*, *])"),
    (r'level:["from", "to"]', r"level:[from, to]"),
    (r"level:[from, to]", r"level:[from, to]"),
    (r'level:["a b c", "d e f"]', r'level:["a b c", "d e f"]'),
    (r'level:["hi", "ho"]', r"level:[hi, ho]"),
    (r'level:["-123", -456]', r"level:[-123, -456]"),
    (r"  level  :  [  1  ,  3  ]  ", r"level:[1, 3]"),
    (r'level:["", "a\*b"]', r'level:["", "a\*b"]'),
    (r'level:["-3", 6) OR (service:"hel lo" AND level:[1, 3])',
     r'(level:[-3, 6) or (service:"hel lo" and level:[1, 3]))'),
    # parsing AST
    (
        'service:"wms-svc-logistics-megasort" and level:""#',
        '(service:wms-svc-logistics-megasort and level:"")',
    ),
    (r"service: composer-api", r"service:composer-api"),
    (r"  service    : a   or   level     :   3  ", r"(service:a or level:3)"),
    (r"service: a or level: 3 AND text:b", r"(service:a or (level:3 and text:b))"),
    (r"service: a or level: 3 or text:b", r"((service:a or level:3) or text:b)"),
    (r" not  service : a ", r"(not service:a)"),
    (r"service:a or not service:b or service:c",
     r"(not (not service:c and (not service:a and service:b)))"),
    (r"not (service:a or service:c)", r"(not (service:a or service:c))"),
    (r"NOT Not service:a", r"service:a"),
    (r"service:a or service:b AND NOT service:c",
     r"(service:a or (not service:c and service:b))"),
    # comments
    (
        "#\n# search by logistics-megasort service\n"
        'service:"wms-svc-logistics-megasort" and level:"#"\n# end of query',
        '(service:wms-svc-logistics-megasort and level:"#")',
    ),
    # text wildcards
    (r"text:some*thing", r"text:some*thing"),
    (r'text:"a**b**"', r"text:a**b**"),
    (r'text:"some* weird* *cases"', r"((text:some* and text:weird*) and text:*cases)"),
    (r'text:"some *weird cases* hmm very*intrs"',
     r"((((text:some and text:*weird) and text:cases*) and text:hmm) and text:very*intrs)"),
    (r'text:"val*" AND text:"val\**"', r'(text:val* and text:"val\*"*)'),
    # complex wildcards
    (r'text:"\*\**"', r'text:"\*\*"*'),
    (r"text:'value=*' AND text:'value=\"\*\"*'",
     r'((text:value and text:*) and ((text:value and text:"\*") and text:*))'),
    (r"text:value'=\"\*\*\"*' AND text:\"\*\*\"".replace("\\\"", '"'), None),  # placeholder, replaced below
    (r"text:'value=*' AND text:'value=\"\*\"*' AND text:'value=\"\*\*\"*' AND text:\"\*\*\" AND text:\"\*\**\"".replace("\\\"", '"'), None),
    # escape
    ("keyword:`+7 995 28 07`", 'keyword:"+7 995 28 07"'),
    ("keyword:'+7 995 28 07'", 'keyword:"+7 995 28 07"'),
    ("keyword:`+7 995 ** **`", r'keyword:"+7 995 \*\* \*\*"'),
    ("keyword:`+7 995 \\** **`", 'keyword:"+7 995 \\\\\\*\\* \\*\\*"'),
    ("keyword:`\\t`", 'keyword:"\\\\t"'),
    ('keyword:"\\t"', 'keyword:"\\t"'),
    ('keyword:"\\\\t"', 'keyword:"\\\\t"'),
    ("keyword:\"'\\n\\t'\"", "keyword:\"'\\n\\t'\""),
    ('keyword:"kafka_impl/producer.go:84"', 'keyword:"kafka_impl/producer.go:84"'),
    ('keyword:"\\/ready"', 'keyword:"\\\\/ready"'),
    (r"message:'7916\*\*\*\*\*79'", r'message:"7916\*\*\*\*\*79"'),
    (r'keyword:"a\*b"', r'keyword:"a\*b"'),
    (r'message:"a\*b"', r'message:"a\*b"'),
    ('keyword:"\\U0001F3CC"', 'keyword:"🏌"'),
    # UTF8
    (r'text:"Произошла ошибка"', r"(text:произошла and text:ошибка)"),
    (
        "text:`Произошла ошибка: недостаточно места на диске`",
        "(((((text:произошла and text:ошибка) and text:недостаточно) and "
        "text:места) and text:на) and text:диске)",
    ),
    ("уровень:'😖'", 'уровень:"😖"'),
    # range (second block)
    (r"level:(1, 3)", r"level:(1, 3)"),
    (r'level:["*", "*"]', r"level:[*, *]"),
    (r"level:[*, *]", r"level:[*, *]"),
    (r"level:[abc, cbd]", r"level:[abc, cbd]"),
    # separators without quotes
    (r"service:clickhouse-shard-1", r"service:clickhouse-shard-1"),
    (r"x-forwarded-for: abc", r"x-forwarded-for:abc"),
    (r'user-agent:"ozondeliveryapp_ios_prod"', r"user-agent:ozondeliveryapp_ios_prod"),
    # filter in
    (r"service:in(auth-api, api-gateway, clickhouse-shard-*)",
     r"((service:auth-api or service:api-gateway) or service:clickhouse-shard-*)"),
    (r"service:in(*, *, *)", r"((service:* or service:*) or service:*)"),
    (r"service:in(*)", r"service:*"),
    (r"level:in(1)", r"level:1"),
    (r"level:in(1, '2', 'three')", r"((level:1 or level:2) or level:three)"),
    (r"level:in(1, '2', ''*3*\"\")".replace("\\\"", '"'), r"((level:1 or level:2) or level:*3*)"),
    ('level:in(""\'\'\'\'"", ****\',\'","****"*")',
     '(level:"" or level:****",,"*****)'),
    (r"level:in(one, t,wo)", r"((level:one or level:t) or level:wo)"),
    (r'level:"in(one, t,wo)"', r'level:"in(one, t,wo)"'),
    (
        "level:error and k8s_namespace:in(default, kube-system) and "
        "k8s_pod:in(kube-proxy-*, kube-apiserver-*, kube-scheduler-*)",
        "((level:error and (k8s_namespace:default or k8s_namespace:kube-system))"
        " and ((k8s_pod:kube-proxy-* or k8s_pod:kube-apiserver-*) or "
        "k8s_pod:kube-scheduler-*))",
    ),
]

# the two placeholder entries above encode awkward quote nesting; write
# them out explicitly here
VECTORS = [v for v in VECTORS if v[1] is not None]
VECTORS += [
    (
        'text:value\'="\\*\\*"*\' AND text:"\\*\\*"',
        '(((text:value and text:"\\*\\*") and text:*) and text:"\\*\\*")',
    ),
    (
        "text:'value=*' AND text:'value=\"\\*\"*' AND text:'value=\"\\*\\*\"*'"
        ' AND text:"\\*\\*" AND text:"\\*\\**"',
        '(((((text:value and text:*) and ((text:value and text:"\\*") and text:*))'
        ' and ((text:value and text:"\\*\\*") and text:*)) and text:"\\*\\*")'
        ' and text:"\\*\\*"*)',
    ),
]


@pytest.mark.parametrize("query,expected", VECTORS)
def test_seqql_golden(query, expected):
    got = seqql_string(parse(query, M))
    assert got == expected
    # round-trip stability, as the reference test asserts
    assert seqql_string(parse(got, M)) == got


# `seqql_pipes_test.go` TestParsePipeFields / TestParsePipeFieldsExcept
PIPE_VECTORS = [
    ("* | fields  message,error, level", "* | fields message, error, level"),
    ("* | fields level", "* | fields level"),
    ('* | fields "_id"', "* | fields _id"),
    ('* | fields "_\\\\message\\\\_"', '* | fields "_\\\\message\\\\_"'),
    ('* | fields "_\\\\message*"', '* | fields "_\\\\message\\*"'),
    ("* | fields k8s_namespace", "* | fields k8s_namespace"),
    ("* | fields except message,error, level",
     "* | fields except message, error, level"),
    ("* | fields except level", "* | fields except level"),
    ('* | fields except "_id"', "* | fields except _id"),
    ('* | fields except "_\\\\message\\\\_"',
     '* | fields except "_\\\\message\\\\_"'),
    ('* | fields except "_\\\\message*"', '* | fields except "_\\\\message\\*"'),
    ("* | fields except k8s_namespace", "* | fields except k8s_namespace"),
]


@pytest.mark.parametrize("query,expected", PIPE_VECTORS)
def test_seqql_golden_pipes(query, expected):
    got = seqql_string(parse(query, M))
    assert got == expected
    assert seqql_string(parse(got, M)) == got


# `seqql_filter_test.go` TestParseSeqQLError — every query must fail to
# parse (messages are not pinned; the reference's exact wording is its own)
ERROR_QUERIES = [
    'service:"some', 'service:some "', 'service:some"',
    'service:some"service:clickhouse', 'service:"some"*"thing',
    'service:"some"*thing"', 'service:"some" *"thing"',
    "service: some thing", 'service:"some thing',
    'service:    some"thing',
    'service:"some text AND level:"3"', 'service:some text" AND level:"3"',
    "AND", "NOT", "NOT NOT", "m:a NOT",
    "service: AND level: 3", "service: some AND level:",
    "m:a AND OR m : b", "m:a NOT AND m:b", 'service: some thing"',
    "[1 TO 3]:some", r"service:a\*b", r"message:a\*b", "*:*",
    'service:"workflow-api"and message:"Found"',
    "level:[1 3]", "level:[1TO3]", "level:[1 TO 3", "level:1 TO 3]",
    "level:[]", "level:[1 TO [3]]", "level:[1 TO 3]]", "level:[[1 TO 3]]",
    "level:[[1 TO 3]", "level:[1 TP 3]", "level:[1 TO 3[", "level:]1 TO 3]",
    "level:[", "level:[1", "level:[*", 'level:["1', "level:[ 1 to",
    "level:[1 to", "level:[1 to *", "level:[1 to 2", "level:[1 to 2*",
    'level:[1 to "2', 'level:[1 to "2"', "level:[1]", "level:[*]",
    'level:[1 to "2]',
    "level:[** TO 1]", "level:[1 TO a*]", "level:[1 TO a*b]",
    "level:[1 TO *b]", 'level:["**" TO 1]', 'level:[1 TO "a*"]',
    'level:[1, "a*b"]', 'level:[1, "*b"]',
    ":[1 TO 3]", ":some", ':"abc"', "service:", '"":value',
    "(m:a", "m:a)", "m:a AND (", "m:a (", "m:a )", "m:a( AND m:a",
    "m:a (AND m:a)", "m:a) AND m:a", "some field:abc", "level service:abc",
    "(level:3 AND level level:abc)", 'NOT (:"abc")',
    "service:in", "service:in()", "service:in(1,)", "service:in)",
    "service:in(1", "service:in(1,3^2)", "in(1):in(2)",
    "service:in(2, in(4, 8))", "service:'in'(2, in(4, 8))",
    "message:--||",
    "source_type:access* | fields message | fields except login:admin",
    "source_type:access* | fields message | fields login",
    "* | fields event, ",
]


@pytest.mark.parametrize("query", ERROR_QUERIES)
def test_seqql_golden_errors(query):
    from seqspark.seqql.parser import ParseError

    err_mapping = Mapping(
        {
            "service": "keyword", "level": "keyword", "m": "keyword",
            "message": "text", "some": "keyword", "in": "keyword",
            "source_type": "keyword", "login": "keyword", "event": "keyword",
        }
    )
    with pytest.raises(ParseError):
        parse(query, err_mapping)


def test_seqql_fuzz_permutations():
    """`seqql_filter_test.go` TestSeqQLParserFuzz: every character
    permutation of these templates is invalid. Templates ≤ 8 chars are
    enumerated exhaustively (Lehmer scheme, like the reference); longer
    ones are sampled deterministically."""
    import random

    from seqspark.seqql.parser import ParseError

    templates = [
        "m:a[]", "m::a", "m:::a", 'm:a("', "m:()", 'm:"',
        ':()""', 'm:a OR ()"', "AND OR NOT",
    ]
    fuzz_mapping = Mapping({"m": "keyword"})

    def perms(template):
        n = len(template)
        if n <= 8:
            p = [0] * n
            while p[0] < n:
                res = list(template)
                for i, v in enumerate(p):
                    res[i], res[i + v] = res[i + v], res[i]
                yield "".join(res)
                # nextPerm
                for i in range(n - 1, -1, -1):
                    if i == 0 or p[i] < n - i - 1:
                        p[i] += 1
                        break
                    p[i] = 0
        else:
            rng = random.Random(hash(template) & 0xFFFF)
            chars = list(template)
            for _ in range(3000):
                rng.shuffle(chars)
                yield "".join(chars)

    for template in templates:
        for q in perms(template):
            try:
                parse(q, fuzz_mapping)
            except ParseError:
                continue
            raise AssertionError(f"permutation parsed: {q!r} of {template!r}")


def test_seqql_golden_case_sensitive():
    """`seqql_filter_test.go` TestSeqQLCaseSensitive (nil mapping)."""
    nilish = Mapping({"service": "keyword", "text": "text"})
    for q, exp in (
        ("service: AbCdEf", "service:AbCdEf"),
        ("text: AbCdEf", "text:AbCdEf"),
        ("_exists_: 'AbCdEf'", "_exists_:AbCdEf"),
    ):
        assert seqql_string(parse(q, nilish, case_sensitive=True)) == exp
    for q, exp in (
        ("service: AbCdEf", "service:abcdef"),
        ("text: AbCdEf", "text:abcdef"),
        ("_exists_: `AbCdEf`", "_exists_:AbCdEf"),
    ):
        assert seqql_string(parse(q, nilish, case_sensitive=False)) == exp
