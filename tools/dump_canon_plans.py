import os, sys
sys.path.insert(0, '/root/repo')
os.environ.setdefault("SIRIX_SPARK_CACHE_TABLES", "1")
from sirix_spark import get_spark
from sirix_spark.queries import registry

spark = get_spark("canon-dump")
sf = "/root/testdata/sf0.1"
reg = registry()
names = ["minhash_signatures","minhash_lsh_pairs","jaccard_near_dup","fuzzy_verify_pairs",
         "simhash","embedding_near_dup","knn_join","cosine_topk","dedup_clusters",
         "exact_dedup","text_profile","training_corpus_filter","quality_score","lang_id",
         "ngram_freq","token_count","fingerprint","hash_sample","stratified_sample",
         "length_histogram","sessionize_events","asof_join_orders_events","valid_at",
         "previous_next_event","shipping_priority","pricing_summary","multimodal_features"]
outdir = sys.argv[1]  # e.g. plans/r10 canon evidence: sha256 manifests committed as canon_expr_twins_{before,after}.sha256
os.makedirs(outdir, exist_ok=True)
for n in names:
    try:
        df = reg[n].fn(spark, sf)
        s = df._jdf.queryExecution().analyzed().canonicalized().toString()
        with open(os.path.join(outdir, n + ".txt"), "w") as f:
            f.write(s)
        print("ok", n)
    except Exception as e:
        print("ERR", n, type(e).__name__, str(e)[:120])
spark.stop()
