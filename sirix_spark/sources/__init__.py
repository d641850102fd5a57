"""Source connectors beyond parquet/JSON: XML shredding into the
node-table model."""
