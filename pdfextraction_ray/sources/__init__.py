from .warc import WARCDatasource, read_warc, write_warc_file  # noqa: F401
