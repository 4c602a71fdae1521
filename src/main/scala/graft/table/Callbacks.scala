package graft.table

/** User-extensible lifecycle callbacks, loaded reflectively from table
  * options (reference: paimon-core table/sink/TagCallback.java and
  * CommitCallback.java, wired via CoreOptions `tag.callbacks` /
  * `commit.callbacks`).
  *
  * Implementations need a public no-arg or (GraftTable) constructor;
  * `commit.callbacks` classes may instead take a single String when a
  * `commit.callback.<class>.param` option supplies one. Callback
  * failures are logged and never fail the table operation — the
  * snapshot/tag is already durable when callbacks fire.
  */
trait GraftTagCallback {
  def notifyCreation(table: GraftTable, tagName: String): Unit
  def notifyDeletion(table: GraftTable, tagName: String): Unit
}

/** Notified once per committed snapshot id, after the snapshot CAS
  * succeeded (reference: CommitCallback.call — used for external
  * metastore sync, lineage reporting and the like). */
trait GraftCommitCallback {
  def call(table: GraftTable, snapshotId: Long): Unit
}
