from hadoop_stuff_spark.functions.codecs import (
    gzip_compress,
    gzip_decompress,
    gzip_decompress_str,
)

__all__ = ["gzip_compress", "gzip_decompress", "gzip_decompress_str"]
