from mapreduce_framework_spark.mr.runner import (
    bucket_of,
    frame_as_inputs,
    read_text_output,
    read_whole_files,
    run_job,
    run_sequential,
    write_text_output,
)
from mapreduce_framework_spark.mr.apps import APPS

__all__ = [
    "APPS",
    "bucket_of",
    "frame_as_inputs",
    "read_text_output",
    "read_whole_files",
    "run_job",
    "run_sequential",
    "write_text_output",
]
