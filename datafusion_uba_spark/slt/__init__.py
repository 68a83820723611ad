from datafusion_uba_spark.slt.runner import run_file, run_text

__all__ = ["run_file", "run_text"]
