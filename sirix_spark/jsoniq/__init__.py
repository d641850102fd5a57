"""JSONiq-subset entry point (SirixCompileChain.java:426-446).

The reference's only user-facing query language is JSONiq/XQuery via
Brackit. SURVEY.md §3 decided against re-implementing a full parser;
this package closes the usability gap with a translator for the
query shapes the reference's own test corpus exercises
(bundles/sirix-query/src/test/java/io/sirix/query/JsonIntegrationTest.java):

- FLWOR: for / at $pos / let / where / group by / order by / return
- path steps: $v.field, $v."quoted field", [] unbox, [i] index,
  [i:j] slice, [?$$ predicate] filter
- object {k: v, ...} / {$i, 'k': v} merge and array construction
- comparison (eq/ne/lt/le/gt/ge and symbolic), and/or/not,
  arithmetic (+ - * div idiv mod), if/then/else
- aggregates count/sum/avg/min/max + distinct-values over a
  grouped variable or a nested FLWOR
- fn:/string/number library subset (contains, starts-with, ...)
- jn:doc / jn:all-times + temporal accessors (sdb:revision, ...)
- JSONiq updates: insert/delete/replace/rename json → store commits

Grammar is a deliberate SUBSET — unsupported syntax raises
JsoniqSyntaxError with the offending token, never silently
mis-executes.
"""

from sirix_spark.jsoniq.parser import JsoniqSyntaxError, parse
from sirix_spark.jsoniq.compiler import JsoniqCompileError, execute

__all__ = ["parse", "execute", "JsoniqSyntaxError", "JsoniqCompileError"]
