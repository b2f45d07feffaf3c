"""Output sinks (SURVEY §2.1): the Avro url_resource sink and the
partitioned-parquet query layout live here."""
