"""Interleaved A/B: wallet_features with vs without fan_out on the orders
scan (VERDICT r17 item 6: the flagship read 5.75 s on a byte-identical
plan with the worst 8-vs-32-core scaling ratio, 0.30 — decide with a
paired A/B whether the 0-shuffle chain genuinely serializes on the
single-row-group scan).

A = shipped code (no fan; scan + 1-row broadcast agg, zero shuffles).
B = fan_out(orders scan) before the synth projection — one round-robin
    exchange, then maxima agg and the 34-column projection run at session
    parallelism.
Timed action = bench.py's exact action; checksums asserted identical.

Usage: python tools/ab_wallet_fan.py [--reps N]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cyrela_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import cyrela_etl_spark.queries.walletq as walletq
    from cyrela_etl_spark.sources.parquet import fan_out

    spark = get_spark(app_name="ab-wallet-fan")
    spark.sparkContext.setLogLevel("ERROR")

    real_synth = walletq.synth_wallet

    def _project(o):
        brand = F.when(F.col("o_orderpriority") == "1-URGENT", "Cyrela")
        brand = brand.when(F.col("o_orderpriority") == "2-HIGH", "Living")
        brand = brand.when(F.col("o_orderpriority") == "3-MEDIUM", "VIVAZ").otherwise("Outra")
        return o.select(
            (F.col("o_orderkey") % 97 + 1).cast("int").alias("empresa"),
            brand.alias("marca"),
            F.concat(F.lit("E"), F.col("o_custkey")).alias("empreendimento"),
            F.concat(F.lit("C"), F.col("o_custkey")).alias("cliente"),
            F.lit(None).cast("string").alias("regional"),
            (F.col("o_orderkey") % 50).cast("int").alias("obra"),
            (F.col("o_orderkey") % 5 + 1).cast("int").alias("bloco"),
            (F.col("o_orderkey") % 400).cast("int").alias("unidade"),
            F.date_format("o_orderdate", "dd/MM/yyyy").alias("dt_venda"),
            F.date_format(F.date_add("o_orderdate", 30), "dd/MM/yyyy").alias("dt_chaves"),
            (F.col("o_orderkey") % 1000).cast("int").alias("carteira_sd_gerencial"),
            F.col("o_totalprice").alias("saldo_devedor"),
            F.date_format(F.date_add("o_orderdate", 90), "dd/MM/yyyy").alias("data_base"),
            F.lit(0.0).alias("total_atraso"),
            F.lit(0).cast("int").alias("faixa_de_atraso"),
            (-(F.col("o_orderkey") % 150)).cast("int").alias("dias_atraso"),
            (F.col("o_totalprice") * 0.5).alias("valor_pago_atualizado"),
            (F.col("o_totalprice") * 0.25).alias("valor_pago"),
            F.lit(None).cast("string").alias("status"),
            F.lit(None).cast("string").alias("dt_reneg"),
            F.lit(None).cast("string").alias("descosn"),
            F.lit(None).cast("string").alias("vaga"),
            (F.col("o_totalprice") * 2.0).alias("vgv"),
        )

    def fanned_synth(spark, sf_dir):
        return _project(fan_out(spark.read.parquet(f"{sf_dir}/orders.parquet")))

    def timed():
        t0 = time.perf_counter()
        df = walletq.wallet_features_synth(spark, sf_dir)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*[F.col(c) for c in df.columns])).alias("checksum"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt, (row["n"], row["checksum"])

    # warmup both legs
    walletq.synth_wallet = real_synth
    timed()
    walletq.synth_wallet = fanned_synth
    timed()

    a_s: list[float] = []
    b_s: list[float] = []
    sigs: set = set()
    for r in range(reps):
        for leg, samples in (("A", a_s), ("B", b_s)):
            walletq.synth_wallet = real_synth if leg == "A" else fanned_synth
            dt, sig = timed()
            samples.append(dt)
            sigs.add(sig)
            print(f"wallet rep {r + 1}/{reps} {'raw' if leg == 'A' else 'fan'}: {dt:.3f}s n={sig[0]}", file=sys.stderr)
    walletq.synth_wallet = real_synth

    print(json.dumps({
        "raw_median_sec": round(statistics.median(a_s), 3),
        "fan_median_sec": round(statistics.median(b_s), 3),
        "checksums_identical": len(sigs) == 1,
        "raw_samples": [round(s, 3) for s in a_s],
        "fan_samples": [round(s, 3) for s in b_s],
    }, indent=1))


if __name__ == "__main__":
    main()
