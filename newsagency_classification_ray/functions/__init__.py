"""Pure (Ray-free) scalar / text functions shared by the stages."""
