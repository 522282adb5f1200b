"""Sources & sinks: parquet corpus loaders live in ``catalog``; this
package holds ingest (Excel, synthetic generation) and the managed-table
write path."""
