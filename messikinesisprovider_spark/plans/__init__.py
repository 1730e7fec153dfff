"""Plan inspection: helpers to assert pushdown/broadcast/codegen properties."""
