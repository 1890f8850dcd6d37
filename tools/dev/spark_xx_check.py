import os
os.environ.setdefault("SPARK_HOME", "/opt/spark")
import sys
sys.path.insert(0, "/opt/spark/python")
sys.path.insert(0, "/opt/spark/python/lib/py4j-0.10.9.9-src.zip")
import glob
for z in glob.glob("/opt/spark/python/lib/py4j*.zip"):
    sys.path.insert(0, z)
from pyspark.sql import SparkSession, functions as F
from xxh64_ref import spark_xxhash64, to_signed

spark = SparkSession.builder.master("local[2]").appName("xxcheck").getOrCreate()
tests = [
    ("",), ("a",), ("abc",), ("hello",), ("hello world this is a long string over thirty two bytes for stripes",),
    ("exactly32bytes_0123456789abcdef!",), ("w1", "w2", "w3"), ("the", "quick", "brown"),
    ("unicodeé中文",), ("tab\tsep",), ("0123456789abcdefghijklmnopqrstuvwxyzABCDE", "x", "yz"),
    ("fourbyte" * 3 + "abcd",), ("sevenchr",), ("123456789012",),
]
rows = []
for t in tests:
    cols = [F.lit(s) for s in t]
    df = spark.range(1).select(F.xxhash64(*cols).alias("h"))
    got = df.head()[0]
    want = to_signed(spark_xxhash64(*t))
    status = "OK " if got == want else "MISMATCH"
    print(status, repr(t), got, want)
spark.stop()
