"""`import module namespace … at "lib.xq"` (XQuery 3.1 §4.12) — the
last fail-closed Brackit prolog construct (PARITY.md; Brackit ships
library modules via libraries.gradle:16). Library modules parse with
parser.parse_library_module; imported functions register through the
existing UDF machinery under both the importer's prefix and the
module's own (so module-internal cross-calls keep working). Location
hints resolve relative to $SIRIX_JSONIQ_MODULE_PATH (default cwd);
the declared target namespace must match the import's URI."""

from __future__ import annotations

import pytest

MOD = (
    'module namespace m = "http://example.com/m";\n'
    "declare function m:double($x) { $x * 2 };\n"
    "declare function m:quad($x) { m:double(m:double($x)) };\n"
)


@pytest.fixture()
def ev(spark, tmp_path, monkeypatch):
    from sirix_spark.jsoniq.docmodel import DocEvaluator
    from sirix_spark.store.docstore import DocumentStore

    (tmp_path / "m.xq").write_text(MOD)
    monkeypatch.setenv("SIRIX_JSONIQ_MODULE_PATH", str(tmp_path))
    return DocEvaluator(spark, DocumentStore(spark, str(tmp_path / "db")))


def test_import_with_own_prefix(ev):
    q = ('import module namespace mm = "http://example.com/m" '
         'at "m.xq"; mm:quad(3)')
    assert ev.execute(q) == "12"


def test_import_same_prefix_and_cross_calls(ev):
    q = ('import module namespace m = "http://example.com/m" '
         'at "m.xq"; m:double(7) + m:quad(1)')
    assert ev.execute(q) == "18"


def test_import_namespace_mismatch_fails(ev):
    from sirix_spark.jsoniq.parser import JsoniqSyntaxError

    with pytest.raises(JsoniqSyntaxError, match="declares namespace"):
        ev.execute('import module namespace z = "http://other" '
                   'at "m.xq"; z:double(1)')


def test_import_missing_file_fails(ev):
    from sirix_spark.jsoniq.parser import JsoniqSyntaxError

    with pytest.raises(JsoniqSyntaxError, match="cannot read"):
        ev.execute('import module namespace m = "http://example.com/m" '
                   'at "nope.xq"; m:double(1)')


def test_import_requires_location_hint(ev):
    from sirix_spark.jsoniq.parser import JsoniqSyntaxError

    with pytest.raises(JsoniqSyntaxError, match="location hint"):
        ev.execute('import module namespace m = "http://example.com/m"; '
                   "m:double(1)")


def test_parse_library_module_shape():
    from sirix_spark.jsoniq.parser import parse_library_module

    pfx, uri, decls = parse_library_module(MOD)
    assert pfx == "m"
    assert uri == "http://example.com/m"
    assert [d.name for d in decls] == ["m:double", "m:quad"]
