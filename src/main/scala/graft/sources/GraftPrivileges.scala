package graft.sources

import graft.core.{FileIO, LocalFileIO}

/** File-based access control for a warehouse (reference: paimon-core
  * privilege/ — FileBasedPrivilegeManager, PrivilegeType,
  * PrivilegeChecker, NoPrivilegeException).
  *
  * The privilege store lives beside the data it protects:
  * `<warehouse>/sys.privilege/users.json` (user → sha256(password)) and
  * `grants.json` (user, identifier, privilege). Once
  * `init_file_based_privilege` creates the store, every GraftCatalog
  * bound to the warehouse authenticates with catalog options
  * `spark.sql.catalog.<name>.user` / `.password` and all accesses are
  * checked; an un-initialized warehouse enforces nothing — identical to
  * the reference's opt-in model.
  *
  * Identifier scope: `*` = catalog-wide, `db` = database-wide,
  * `db.table` = one table. The ADMIN privilege (granted on `*`)
  * implies everything, as does the root user. All operations are
  * driver-side metadata reads of two small JSON files — scale-free.
  *
  * Trust boundary (same as the reference): enforcement binds
  * CATALOG-MEDIATED access. A principal with direct storage access
  * (programmatic `GraftTable.load`, raw filesystem reads, or a REST
  * catalog bearer token) is outside this layer — storage ACLs remain
  * the hard boundary, exactly as with the reference's
  * FileBasedPrivilegeManager. Views check the INVOKER's privileges on
  * the base tables (the stored text re-resolves to base scans, each
  * carrying its own SELECT guard); a grant on the view name alone does
  * not confer base-table access.
  */
object GraftPrivileges {

  /** Privilege kinds (reference: PrivilegeType.java). */
  val Select = "SELECT"
  val Insert = "INSERT"
  val AlterTable = "ALTER_TABLE"
  val DropTable = "DROP_TABLE"
  val CreateTable = "CREATE_TABLE"
  val Admin = "ADMIN"
  val All: Set[String] =
    Set(Select, Insert, AlterTable, DropTable, CreateTable, Admin)

  class NoPrivilegeException(user: String, privilege: String, ident: String)
    extends RuntimeException(
      s"user $user lacks $privilege on ${if (ident.isEmpty) "*" else ident}")

  private case class Store(
      users: Map[String, String],
      grants: Seq[Seq[String]]) // (user, identifier, privilege)

  // metadata IO through the table layer's FileIO seam (atomic writes;
  // an object-store port swaps one implementation, not call sites)
  private val io: FileIO = new LocalFileIO

  private def storePath(warehouse: String) =
    s"$warehouse/sys.privilege/store.json"

  private def sha(password: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(password.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def read(warehouse: String): Option[Store] = {
    val p = storePath(warehouse)
    if (!io.exists(p)) None
    else Some(graft.core.Json.read(io.readString(p), classOf[Store]))
  }

  private def write(warehouse: String, s: Store): Unit =
    io.writeString(storePath(warehouse), graft.core.Json.write(s))

  def enabled(warehouse: String): Boolean = io.exists(storePath(warehouse))

  def init(warehouse: String, rootPassword: String): Unit = {
    require(!enabled(warehouse), "privilege store already initialized")
    write(warehouse, Store(Map("root" -> sha(rootPassword)), Seq.empty))
  }

  /** None = store disabled (everything allowed); Some(user) = verified
    * identity. Bad credentials fail loudly. */
  def authenticate(warehouse: String,
      user: Option[String], password: Option[String]): Option[String] =
    read(warehouse).map { st =>
      val u = user.getOrElse("anonymous")
      val ok = st.users.get(u).contains(sha(password.getOrElse("")))
      if (!ok) throw new SecurityException(
        s"authentication failed for user $u on privileged warehouse")
      u
    }

  /** Does `ident` fall under grant scope `scope`? */
  private def covers(scope: String, ident: String): Boolean =
    scope == "*" || scope == ident ||
      (ident.contains('.') && ident.startsWith(scope + "."))

  def check(warehouse: String, user: Option[String],
      privilege: String, ident: String): Unit = {
    val st = read(warehouse).getOrElse(return) // disabled → allow
    val u = user.getOrElse("anonymous")
    if (u == "root") return
    // ADMIN is scope-relative: a '*' ADMIN implies everything, a
    // db-scoped ADMIN implies every privilege beneath that db (so a
    // grant accepted by grant() is never silently inert). Note ADMIN
    // checks themselves pass ident='*', which only a '*' scope covers —
    // a db-scoped admin does not gain warehouse-wide procedures.
    val allowed = st.grants.exists { g =>
      val (gu, scope, p) = (g.head, g(1), g(2))
      gu == u && (p == Admin || p == privilege) && covers(scope, ident)
    }
    if (!allowed) throw new NoPrivilegeException(u, privilege, ident)
  }

  def createUser(warehouse: String, user: String, password: String): Unit = {
    val st = read(warehouse).getOrElse(
      throw new IllegalStateException("privilege store not initialized"))
    require(!st.users.contains(user), s"user $user already exists")
    write(warehouse, st.copy(users = st.users + (user -> sha(password))))
  }

  def dropUser(warehouse: String, user: String): Unit = {
    require(user != "root", "cannot drop root")
    val st = read(warehouse).getOrElse(return)
    write(warehouse, Store(st.users - user, st.grants.filterNot(_.head == user)))
  }

  def grant(warehouse: String, user: String, ident: String, privilege: String): Unit = {
    require(All.contains(privilege), s"unknown privilege $privilege")
    val st = read(warehouse).getOrElse(
      throw new IllegalStateException("privilege store not initialized"))
    require(st.users.contains(user), s"no user $user")
    val entry = Seq(user, ident, privilege)
    if (!st.grants.contains(entry))
      write(warehouse, st.copy(grants = st.grants :+ entry))
  }

  def revoke(warehouse: String, user: String, ident: String, privilege: String): Unit = {
    val st = read(warehouse).getOrElse(return)
    write(warehouse, st.copy(grants =
      st.grants.filterNot(g => g.head == user && g(1) == ident && g(2) == privilege)))
  }

  /** Keep grants coherent across renames/drops (reference:
    * PrivilegeManager.objectRenamed / objectDropped). */
  def objectRenamed(warehouse: String, from: String, to: String): Unit = {
    val st = read(warehouse).getOrElse(return)
    write(warehouse, st.copy(grants = st.grants.map {
      case Seq(u, i, p) if i == from => Seq(u, to, p)
      case g => g
    }))
  }

  def objectDropped(warehouse: String, ident: String): Unit = {
    val st = read(warehouse).getOrElse(return)
    write(warehouse, st.copy(grants = st.grants.filterNot(_(1) == ident)))
  }

  /** Namespace cascade-drop: remove grants on the namespace and on
    * everything beneath it. */
  def namespaceDropped(warehouse: String, ns: String): Unit = {
    val st = read(warehouse).getOrElse(return)
    write(warehouse, st.copy(grants = st.grants.filterNot(g =>
      g(1) == ns || g(1).startsWith(ns + "."))))
  }
}
